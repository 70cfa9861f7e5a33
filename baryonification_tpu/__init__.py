"""baryonification_tpu — a TPU-native baryonification framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
DhayaaAnbajagane/Baryonification ("BaryonForge"): parametric halo-profile
models (Schneider+19, Arico+20, Mead+20, Battaglia+12, thermodynamics),
displacement-function baryonification of HEALPix shells / 2D & 3D grids /
particle snapshots, and profile painting (tSZ, pressure, temperature, ...),
with device-resident interpolation tables, vmapped gather-displace-scatter
kernels, and `jax.sharding` mesh parallelism instead of joblib processes.

Everything in the compute path is jit-able and differentiable; hot loops are
fixed-shape and vectorized so XLA can tile them onto TPU hardware.

Precision policy: model building (profile quadratures, mass inversion,
displacement tables) runs in float64 — the iterative inversions genuinely
need it (the reference keeps scipy's f64 throughout) — so importing this
package enables `jax_enable_x64`. The per-pixel hot paths
(gather/displace/scatter over millions of pixels) explicitly run in float32
with conservation-safe reductions.
"""

import os as _os

import jax

jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: the hot kernels are compiled per window /
# chunk shape and recompiling costs minutes through remote-compile TPU
# tunnels. Env vars are ineffective when the platform plugin imports JAX
# before user code runs, so set the config directly (respecting an
# explicit user setting).
if jax.config.jax_compilation_cache_dir is None:
    jax.config.update(
        "jax_compilation_cache_dir",
        _os.environ.get("JAX_COMPILATION_CACHE_DIR",
                        _os.path.expanduser("~/.cache/jax")))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

from . import constants
from . import ops
from . import cosmology
from .cosmology import Cosmology, CosmologyDevice, cosmology_device, MassDef
from . import utils
from .utils import (build_cosmodict, log_time, generate_operator_method,
                    destory_Pk)
from . import io
from .io import (HaloLightConeCatalog, HaloNDCatalog, LightconeShell,
                 GriddedMap, ParticleSnapshot)
from . import profiles
# the reference's top level star-exports the Schneider19, Thermodynamic
# and BaryonCorrection names (`BaryonForge/__init__.py` +
# `Profiles/__init__.py`), so `bfg.DarkMatterBaryon`/`bfg.ThermalSZ`/
# `bfg.BaryonificationClass` must work here too for drop-in migration
from .profiles import (SchneiderProfiles, DarkMatter, TwoHalo, Stars, Gas,
                       ShockedGas, CollisionlessMatter, DarkMatterOnly,
                       DarkMatterBaryon, Pressure, NonThermalFrac,
                       NonThermalFracGreen20, Temperature, ThermalSZ,
                       ElectronPressure, GasNumberDensity, XrayLuminosity)
from .pixels import ConvolvedProfile, GridPixelApprox, HealPixel, NoPix
from .displacement import (BaryonificationClass, Baryonification2D,
                           Baryonification3D)
from .tabulate import (TabulatedProfile, ParamTabulatedProfile,
                       TabulatedCorrelation3D)
from . import runners
from .runners import (DefaultRunner, BaryonifyShell, PaintProfilesShell,
                      PaintProfilesAnisShell, DefaultRunnerGrid,
                      BaryonifyGrid, PaintProfilesGrid,
                      PaintProfilesAnisGrid, DefaultRunnerSnapshot,
                      BaryonifySnapshot)
from .parallel import SimpleParallel, SplitJoinParallel
from . import analysis
from . import inference
from .default_params import DEFAULT_PARAMS, default_params

__version__ = "1.0.0"
