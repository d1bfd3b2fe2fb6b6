"""ctypes bindings for the native host-edge library (native/beatrice_host.cc).

Build it with `make -C native` (g++, no external deps).  If the shared
library is missing, `load_library()` returns None and callers fall back to
the pure-NumPy equivalents in host.py -- same behavior, slower edge.
"""

from .host import (  # noqa: F401
    HostResampler,
    Reblocker,
    SpscRing,
    load_library,
    native_available,
)
