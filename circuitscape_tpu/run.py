"""Public compute entry points and scenario dispatch.

Parity reference: src/run.jl:1-67 (compute, _run, _compute).
"""

from __future__ import annotations

import logging

import numpy as np

from . import cslog
from .config import CSConfig, init_config, parse_config, write_config
from .timer import CSTIMER


def compute(path_or_dict):
    """Run a job from an INI file path or a raw config dict
    (src/run.jl:14-24)."""
    if isinstance(path_or_dict, str):
        cfg = parse_config(path_or_dict)
    else:
        cfg_dict = init_config()
        cfg_dict.update(path_or_dict)
        cfg = CSConfig.from_dict(cfg_dict)
    return _run(cfg)


def _run(cfg: CSConfig):
    """src/run.jl:26-45."""
    cslog.update_logging(cfg)
    write_config(cfg)
    dtype = np.float32 if cfg.precision == "single" else np.float64
    if dtype == np.float32 and cfg.solver == "mklpardiso":
        cslog.warn("Pardiso solver works only in double precision. "
                   "Switching precision to double.")
        dtype = np.float64
    cslog.info("Precision used: %s", cfg.precision)
    if cfg.parallelize:
        cslog.info("Solves are batched on the accelerator "
                   "(parallelize flag accepted for compatibility)")
    CSTIMER.reset()
    from . import stats
    stats.reset()
    with CSTIMER("complete job"):
        r = _compute(cfg, dtype)
    if cfg.log_level == logging.DEBUG:
        cslog.info("\n%s", CSTIMER.table())
    return r


def _compute(cfg: CSConfig, dtype):
    """src/run.jl:47-67."""
    from .drivers.advanced import raster_advanced
    from .drivers.network import network_advanced, network_pairwise
    from .drivers.onetoall import raster_one_to_all
    from .drivers.raster import raster_pairwise

    if cfg.data_type == "raster":
        if cfg.scenario == "pairwise":
            return raster_pairwise(cfg, dtype)
        if cfg.scenario == "advanced":
            return raster_advanced(cfg, dtype)
        return raster_one_to_all(cfg, dtype)
    else:
        if cfg.scenario == "pairwise":
            return network_pairwise(cfg, dtype)
        return network_advanced(cfg, dtype)
