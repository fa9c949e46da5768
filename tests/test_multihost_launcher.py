"""Multi-host launcher plumbing: flag parsing + CLI pass-through run as a
single process on the CPU mesh (a real pod run only changes the
jax.distributed.initialize arguments, not this code path)."""
import os
import subprocess
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(__file__))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_launcher_runs_distributed_fit(tmp_path):
    import yaml
    from test_fit_e2e import _make_dataset
    _make_dataset(str(tmp_path), n_views=4)
    cfg = {
        "distributed": {"dp": 2, "mp": 4, "backend": "xla",
                        "compact_k": "auto"},
        "data": {"parser": {"class_path": "Blender",
                            "init_args": {"path": str(tmp_path),
                                          "random_point_count": 300,
                                          "white_background": False}}},
        "model": {"gaussian": {"sh_degree": 0},
                  "renderer": {"init_args": {"max_per_tile": 256,
                                             "chunk": 32,
                                             "min_isect_capacity": 8192}}},
        "trainer": {"max_steps": 4, "background_color": [0., 0., 0.]},
        "fit": {"max_steps": 4, "min_capacity": 8192,
                "save_iterations": [], "save_ply": False,
                "log_interval": 2, "resume": "never", "size_bucket": 8},
    }
    cfg_path = str(tmp_path / "dist.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)

    env = os.environ.copy()
    env["GSL_PLATFORM"] = "cpu"
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                        + " --xla_force_host_platform_device_count=8")
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts",
                                      "launch_multihost.py"),
         "--num-processes", "1", "--process-id", "0",
         "fit", "--config", cfg_path, "-n", "mh_out",
         "--output", str(tmp_path)],
        capture_output=True, text=True, env=env, timeout=600,
        cwd=REPO)
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "[multihost] process 0/1" in proc.stdout
    assert os.path.isfile(str(tmp_path / "mh_out" / "mp_log.csv")), \
        proc.stdout[-2000:]
