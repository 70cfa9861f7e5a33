"""Quantitative parity against the reference's published-curve anchors.

The reference's de-facto integration tests are scraped published curves
(`/root/reference/examples/S19_Fig1_Scrapped.csv`, checked by eye in
`examples/08_Reproduce_Schneider19.ipynb`). Here the comparison is
asserted: per-curve RMS log10 deviation within stated tolerance bands.
The comparison logic lives in examples/08_schneider19_profiles.py (the
asserted reproduction script); this test drives it under pytest.
"""

import importlib.util
import os
import sys

import numpy as np
import pytest

_EXAMPLES = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         os.pardir, "examples")


def _load_example(name):
    path = os.path.join(_EXAMPLES, name + ".py")
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def ex08():
    return _load_example("08_schneider19_profiles")


@pytest.fixture(scope="module")
def fig1_rms(ex08):
    return ex08.fig1_rms()


class TestS19Fig1:
    """Schneider+19 Fig 1: component rho(r) at M=1e14/h, z=0 vs the
    scraped published curves, with the notebook-08 parameters."""

    def test_all_curves_within_tolerance(self, ex08, fig1_rms):
        bad = {nm: (fig1_rms[nm], tol)
               for nm, (_, tol) in ex08.FIG1_CURVES.items()
               if not fig1_rms[nm] < tol}
        assert not bad, f"curves out of tolerance (rms, tol): {bad}"

    def test_headline_dmo_dmb_sub_2pct(self, fig1_rms):
        """The DMO and beta=1.5 DMB curves — the pair the displacement
        function inverts — agree with the published figure at <0.009 dex
        RMS (~2%), the scraping-noise floor."""
        assert fig1_rms['DMO'] < 0.009
        assert fig1_rms['DMB2'] < 0.009

    def test_overall_rms_budget(self, fig1_rms):
        overall = np.sqrt(np.mean([v**2 for v in fig1_rms.values()]))
        assert overall < 0.06, f"overall Fig-1 RMS {overall:.4f} dex"


class TestS19Fig2:
    """Schneider+19 Fig 2: predicted P_B(k)/P_DMO(k) suppression vs the
    scraped simulation-measured curves (one representative per sweep
    family; the example asserts all 15). Measured RMS ~0.02 on a 10-25%
    signal."""

    @pytest.fixture(scope="module")
    def ex10(self):
        return _load_example("10_delta_pk_snapshot")

    def test_sweep_representatives(self, ex10):
        rms = ex10.fig2_rms(tags=("T4", "Ep1", "Mc4e14"))
        assert set(rms) == {"T4", "Ep1", "Mc4e14"}
        bad = {t: v for t, v in rms.items() if not v < ex10.FIG2_TOL}
        assert not bad, f"Fig-2 curves out of tolerance: {bad}"
