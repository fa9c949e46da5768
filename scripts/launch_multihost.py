"""Multi-host launcher: initialize jax.distributed, build the DCN x ICI
mesh, and run the standard CLI (fit / validate) across all hosts.

The reference's multi-node story is Lightning's subprocess/env launcher +
NCCL process groups (/root/reference/internal/mp_strategy.py:70-73) driven
by SLURM scripts (scripts/train-meganerf_rubble-partitions.slurm). The TPU
analogue is one process per host, each seeing its local chips, with
`jax.distributed.initialize()` stitching them into one global device list;
XLA routes mesh collectives over ICI within a slice and DCN across slices.

Usage (one invocation per host, e.g. via `gcloud compute tpus tpu-vm ssh
--worker=all` on a TPU pod, or one srun task per node):

  python scripts/launch_multihost.py \
      --coordinator 10.0.0.2:9999 --num-processes 4 --process-id $HOST_ID \
      fit --config gsl_tpu/configs/distributed.yaml \
      --data.path /data/garden -n garden-mp

On Cloud TPU pods the three flags can be omitted: jax.distributed
auto-discovers the topology from the TPU metadata. The `distributed:` key
in the config is what routes `fit` to the mesh training loop
(gsl_tpu/parallel/fit_distributed.py); this launcher only establishes the
multi-host runtime around it.

Mesh layout guidance (How-to-Scale-Your-Model recipe): put the
gaussian-sharded axis `mp` INSIDE a host (ICI bandwidth carries the
all_to_all splat exchange), and the camera data-parallel axis `dp` across
hosts (its only collective is the scalar-light grad psum, which tolerates
DCN latency). `make_mesh` orders axes (dp, mp) over `jax.devices()`, which
jax.distributed already returns host-major — so `dp >= n_hosts` with
`mp <= chips_per_host` achieves exactly that; the default (mp=4) does.

Per-host partition training (the scale-out alternative for city-scale
scenes, reference utils/train_partitions.py + slurm): skip this launcher
and instead run `python tools/train_partitions.py --hosts N --host-id i`
on each host — partitions are assigned round-robin per host and each
trains single-host with chip-level dp x mp inside.

Smoke-tested here single-host (this environment exposes one TPU chip); the
flag plumbing is exercised by tests/test_multihost_launcher.py with
num_processes=1 on CPU.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser(
        "launch_multihost",
        description="jax.distributed bootstrap around the gsl_tpu CLI")
    ap.add_argument("--coordinator", default=None,
                    help="host:port of process 0 (omit on Cloud TPU pods "
                         "— auto-discovered)")
    ap.add_argument("--num-processes", type=int, default=None)
    ap.add_argument("--process-id", type=int, default=None)
    ap.add_argument("--local-device-ids", default=None,
                    help="comma-separated local chip ids (optional)")
    args, rest = ap.parse_known_args(argv)

    import gsl_tpu  # noqa: F401  (GSL_PLATFORM handling before jax init)
    import jax

    kwargs = {}
    if args.coordinator is not None:
        kwargs["coordinator_address"] = args.coordinator
    if args.num_processes is not None:
        kwargs["num_processes"] = args.num_processes
    if args.process_id is not None:
        kwargs["process_id"] = args.process_id
    if args.local_device_ids is not None:
        kwargs["local_device_ids"] = [
            int(x) for x in args.local_device_ids.split(",")]
    if kwargs.get("num_processes", 2) > 1 or args.coordinator is not None:
        jax.distributed.initialize(**kwargs)

    n_local = len(jax.local_devices())
    print(f"[multihost] process {jax.process_index()}/"
          f"{jax.process_count()} -- {n_local} local / "
          f"{len(jax.devices())} global devices", flush=True)

    from gsl_tpu.cli import main as cli_main
    cli_main(rest)


if __name__ == "__main__":
    main()
