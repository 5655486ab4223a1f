"""Cold-start decomposition for the whole-tracklet tracker compile (VERDICT r2 #4).

Measures, for the batched device-tracker scan at the bench shapes, with phase
separation:

  trace+lower  — jax tracing + StableHLO emission (host CPU work)
  compile      — XLA backend compile, incl. Mosaic kernel compiles and (on this
                 environment) the remote compile service round trips
  first-exec   — executable load + first batch

Flags isolate the contributors:
  --no-fused     disable the Pallas SA kernels (jnp path; pallas_fps remains)
  --cache-dir D  persistent cache location ('' = no cache). Point it at an empty
                 dir for a true cold measurement, at a warmed dir to measure the
                 cache-hit path.

Prints one summary line; run it a few ways and compare.
"""

import argparse
import sys
import time
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO_ROOT))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--no-fused", action="store_true")
    parser.add_argument("--cache-dir", type=str, default=None,
                        help="persistent compile cache dir; omit for no cache")
    args = parser.parse_args()

    import jax

    if args.cache_dir:
        jax.config.update("jax_compilation_cache_dir", args.cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import numpy as np

    import bench
    from ptt_tpu.eval.device_loop import DeviceTrackingEvaluator
    from ptt_tpu.ops import pallas_sa

    if args.no_fused:
        pallas_sa.DISABLE_FUSED = True

    cfg, model, variables, tracklets, max_points = bench.build_bench_setup()
    ev = DeviceTrackingEvaluator(
        cfg, model, variables, max_points=max_points, batch_size=len(tracklets)
    )

    # replicate dispatch_batch's packing to get the real arg shapes
    handle_args = {}
    orig = ev.track_fn

    class Capture:
        def __call__(self, *a):
            handle_args["args"] = a
            raise _Stop()

    class _Stop(Exception):
        pass

    ev.track_fn = Capture()
    try:
        ev.dispatch_batch(tracklets)
    except _Stop:
        pass
    ev.track_fn = orig
    call_args = handle_args["args"]

    t0 = time.perf_counter()
    lowered = orig.lower(*call_args)
    t_lower = time.perf_counter() - t0

    t0 = time.perf_counter()
    compiled = lowered.compile()
    t_compile = time.perf_counter() - t0

    t0 = time.perf_counter()
    out = compiled(*call_args)
    np.asarray(out[0])
    t_exec = time.perf_counter() - t0

    print(f"fused={not args.no_fused} cache={args.cache_dir or 'none'}: "
          f"trace+lower {t_lower:.1f}s, compile {t_compile:.1f}s, "
          f"first-exec {t_exec:.1f}s")


if __name__ == "__main__":
    main()
