"""Halo-profile families.

Mirrors the reference's `Profiles` subpackage layout
(`/root/reference/BaryonForge/Profiles/__init__.py`): Schneider19,
Thermodynamic and the displacement models live at top level; Arico20,
Mead20 and Battaglia are namespaced modules.
"""

from .base import HaloProfile, CombinedProfile
from .schneider19 import (model_params, SchneiderProfiles, DarkMatter,
                          TwoHalo, Stars, Gas, ShockedGas,
                          CollisionlessMatter, DarkMatterOnly,
                          DarkMatterBaryon)
from .thermodynamic import (Pressure, NonThermalFrac, NonThermalFracGreen20,
                            Temperature, ThermalSZ, ElectronPressure,
                            GasNumberDensity, XrayLuminosity)
from . import schneider19 as Schneider19
from . import thermodynamic as Thermodynamic
from . import arico20 as Arico20
from . import mead20 as Mead20
from . import battaglia as Battaglia
