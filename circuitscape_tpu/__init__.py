"""circuitscape_tpu — a TPU-native landscape-connectivity framework.

A from-scratch re-design of the capabilities of Circuitscape.jl
(reference: github.com/Circuitscape/Circuitscape.jl) for JAX/XLA on TPU:
raster and network graphs become device-resident ELL/stencil Laplacians,
pairwise effective resistances solve as batched multi-RHS preconditioned
CG (one jitted while_loop over the whole pair block), and the direct
tier is a native sparse Cholesky with batched back-substitution.

Public API mirrors the reference:
    compute(path_or_dict)  -> run a job from an INI file or config dict
    start()                -> interactive config wizard (TUI)
    compute_omniscape_current(...) -> in-memory advanced solve
    calculate_cum_current_map / calculate_max_current_map
"""

import os as _os

import jax as _jax

# Double precision is a first-class configuration (precision = double in
# the reference config system); enable x64 before any array is created.
_jax.config.update("jax_enable_x64", True)

# Persistent compilation cache for TPU runs only: remote/TPU compiles
# can take minutes, so cache them across processes.  (On CPU the cache
# can resurrect AOT code compiled with mismatched machine features, so
# it stays off there.)
# jax.config reflects both the JAX_PLATFORMS env default and any
# jax.config.update("jax_platforms", ...) the embedding process made
# before importing this package (the test/verify recipes select CPU
# that way); fall back to the env var for older jax configs.
_plat = (str(getattr(_jax.config, "jax_platforms", "") or "")
         or _os.environ.get("JAX_PLATFORMS", "tpu"))
if _plat.split(",")[0].strip().lower() != "cpu":
    try:
        _cache = _os.environ.get(
            "CS_TPU_JAX_CACHE",
            _os.path.join(_os.path.expanduser("~"), ".cache",
                          "circuitscape_tpu_jax"))
        _os.makedirs(_cache, exist_ok=True)
        _jax.config.update("jax_compilation_cache_dir", _cache)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

from .config import CSConfig, init_config, parse_config, write_config  # noqa: E402
from .run import compute  # noqa: E402
from .solve.dispatch import register_solver  # noqa: E402
from .utils import (calculate_cum_current_map,  # noqa: E402
                    calculate_max_current_map, compute_omniscape_current)

__version__ = "0.2.0"

__all__ = [
    "compute", "CSConfig", "parse_config", "init_config", "write_config",
    "compute_omniscape_current", "calculate_cum_current_map",
    "calculate_max_current_map", "register_solver", "start",
]


def start():
    """Launch the interactive configuration wizard (INIBuilder parity)."""
    from .tui import start as _start
    return _start()
