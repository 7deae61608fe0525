"""Config system tests: parsing, defaults, round-trip, unknown-key
tolerance (reference src/config.jl semantics)."""

import logging

import circuitscape_tpu as cs
from circuitscape_tpu.config import CSConfig, init_config


def test_defaults():
    cfg = CSConfig()
    assert cfg.data_type == "raster"
    assert cfg.scenario == "pairwise"
    assert cfg.solver == "cg+amg"
    assert cfg.precision == "double"
    assert cfg.cholmod_batch_size == 1000
    assert cfg.use_64bit_indexing


def test_round_trip():
    cfg = CSConfig.from_dict({"solver": "cholesky", "precision": "single",
                              "scenario": "one_to_all",
                              "log_level": "debug"})
    assert cfg.solver == "cholmod"
    assert cfg.precision == "single"
    assert cfg.scenario == "one-to-all"
    assert cfg.log_level == logging.DEBUG
    d = cfg.to_dict()
    cfg2 = CSConfig.from_dict(d)
    assert cfg == cfg2


def test_unknown_keys_tolerated(tmp_path):
    ini = tmp_path / "a.ini"
    ini.write_text("[Section]\n"
                   "print_timings = True\n"
                   "low_memory_mode = False\n"
                   "made_up_key = 42\n"
                   "solver = cg+amg\n")
    cfg = cs.parse_config(str(ini))
    assert cfg.solver == "cg+amg"


def test_solver_spellings():
    for s, want in [("cg+amg", "cg+amg"), ("amg+cg", "cg+amg"),
                    ("cholmod", "cholmod"), ("cholesky", "cholmod"),
                    ("cholfact", "cholmod"), ("mklpardiso", "mklpardiso"),
                    ("accelerate", "accelerate"), ("garbage", "cg+amg")]:
        assert CSConfig.from_dict({"solver": s}).solver == want


def test_write_config(tmp_path):
    cfg = CSConfig.from_dict({"output_file": str(tmp_path / "x.out")})
    cs.write_config(cfg)
    text = (tmp_path / "x.out").read_text()
    assert "data_type = raster" in text
    assert "scenario = pairwise" in text


def test_init_config_has_legacy_keys():
    d = init_config()
    assert "print_timings" in d
    assert "screenprint_log" in d
    assert "profiler_log_file" in d
