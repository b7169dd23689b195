"""Direct-solver subpackage: host C++ multifrontal (api), mesh-distributed
device multifrontal (device_mf), and realified complex solves on
complex-incapable TPU runtimes (complexify)."""

from .api import Factorization  # noqa: F401
from .complexify import ComplexDeviceFactorization  # noqa: F401
from .device_mf import DeviceFactorization  # noqa: F401
