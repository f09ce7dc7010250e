"""On-device sweep of the PSE near-grid skin (VERDICT-r4 next #3a).

``near_skin`` > 1 makes the near cells larger than rcut: CAP grows (the
matvec pays O(CAP) more pair rows per slot) but the rebin half-slack
grows from the quantization leftover to ~(skin-1)*rcut/2, cutting the
every-other-step repack cadence of BENCH_r04 (rebin_near 20/40).
This probe runs the production bench measurement (bench._bench_pse_once,
persistent path, hard overflow gate) at several skins on the real chip
and prints one JSON line per point; pick the argmax as BENCH_PSE_SKIN's
default. Reference tuning analog: the VerletList skin knob,
src/utils/VerletList... (half-skin rebuild criterion).

Env: PROBE_SKIN_VALUES (comma list, default "1.0,1.1,1.2,1.35"),
BENCH_PSE_N (131072), BENCH_PSE_STEPS (40).
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_enable_compilation_cache", True)
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)


def main():
    import bench

    n = int(os.environ.get("BENCH_PSE_N", 131072))
    steps = int(os.environ.get("BENCH_PSE_STEPS", 40))
    vals = [float(v) for v in os.environ.get(
        "PROBE_SKIN_VALUES", "1.0,1.1,1.2,1.35").split(",")]
    for skin in vals:
        os.environ["BENCH_PSE_SKIN"] = str(skin)
        out = bench._bench_pse_once(
            n, steps, int(os.environ.get("BENCH_PSE_FAR", 144)),
            None, n_strag=int(os.environ.get("BENCH_PSE_STRAG", 192)),
            far_cap_extra=int(os.environ.get("BENCH_PSE_CAP_EXTRA", 0)),
        )
        if isinstance(out, dict):
            out = dict(out)
        else:
            out = {"value": float(out)}
        out["skin"] = skin
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
