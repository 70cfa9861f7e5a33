#!/usr/bin/env bash
# One entry point for the asserted example reproductions (every script
# exits nonzero on regression). Two tiers:
#
#   ./examples/run_asserted.sh smoke   # ~20 min on a 1-core box
#   ./examples/run_asserted.sh full    # ~2.5 h  on a 1-core box
#
# Scripts run SERIALLY — this box has one core, and concurrent JAX
# processes contend catastrophically (a first compile has been pushed
# past 20 min by one concurrent pytest; CLAUDE.md). All examples force
# the CPU backend internally, so this never touches the TPU worker.
set -u
cd "$(dirname "$0")/.."

TIER="${1:-smoke}"

# name : extra env : budget note
SMOKE=(
  "08_schneider19_profiles.py::S19 Fig1 profile parity (~30 s)"
  "07_shocks.py::Rankine-Hugoniot shock invariants (~1 min)"
  "01_profiles.py::mass-closure invariants (~2 min)"
  "11_arico_profiles.py::Arico20 fraction bookkeeping (~1 min)"
  "13_mead_profiles.py::Mead20 fraction bookkeeping (~1 min)"
  "03_pixel_smoothing.py::pixel-window quadrature anchors (~3 min)"
  "12_arico_delta_pk_snapshot.py::Arico Rdelta box (~1 min)"
  "09_delta_cls_shells.py:NSIDE=64:dC_ell shapes, smoke NSIDE (~3 min)"
  "14_gradient_fit_Mc.py::gradient fit of M_c through the pipeline (~3 min)"
)
FULL_EXTRA=(
  "10_delta_pk_snapshot.py::S19 Fig2 + mock-box pipeline (~5 min)"
  "09_delta_cls_shells.py::dC_ell at NSIDE=512 (~6 min)"
  "18_cosmo_baryon_fisher.py::sigma8+M_c gradients and Fisher (~10 min)"
  "17_anis_paint_composition.py::M_c through baryonify->anis paint (~9 min)"
  "16_joint_fit_Mc_thetaej.py::joint M_c+theta_ej fit + Laplace (~25 min)"
  "15_gradient_fit_dPk.py:SMOKE=1:M_c from dP(k), smoke tier (~15 min)"
)

case "$TIER" in
  smoke) SET=("${SMOKE[@]}");;
  full)  SET=("${SMOKE[@]}" "${FULL_EXTRA[@]}");;
  *) echo "usage: $0 [smoke|full]" >&2; exit 2;;
esac

t_suite=$(date +%s)
fails=()
for entry in "${SET[@]}"; do
  script="${entry%%:*}"
  rest="${entry#*:}"
  envs="${rest%%:*}"
  note="${rest#*:}"
  echo "=== $script ${envs:+[$envs] }— $note"
  t0=$(date +%s)
  if env $envs python "examples/$script" > "/tmp/asserted_${script%.py}.log" 2>&1; then
    echo "    PASS ($(( $(date +%s) - t0 )) s)"
  else
    echo "    FAIL ($(( $(date +%s) - t0 )) s) — log: /tmp/asserted_${script%.py}.log"
    tail -5 "/tmp/asserted_${script%.py}.log" | sed 's/^/    | /'
    fails+=("$script")
  fi
done

echo
echo "total: $(( $(date +%s) - t_suite )) s, ${#fails[@]} failure(s)"
if [ "${#fails[@]}" -gt 0 ]; then
  printf 'FAILED: %s\n' "${fails[@]}"
  exit 1
fi
echo "ALL ASSERTED EXAMPLES PASS ($TIER tier)"
