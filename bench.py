"""Headline benchmark: batched VQT throughput on one chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Baseline: the Rust reference computes one default-parameter VQT frame in
0.165 ms on a desktop CPU core (VQT_REVIEW.md:12-15) ~= 6,060 frames/s.
vs_baseline = our frames/s / 6060.
"""

from __future__ import annotations

import json
import sys





def main() -> None:
    from pitchvis_tpu.bench.configs import ALL_CONFIGS, bench_offline_vqt

    if "--config" in sys.argv:
        name = sys.argv[sys.argv.index("--config") + 1]
        if name == "all":
            for key, fn in ALL_CONFIGS.items():
                result = fn()
                result["config"] = key
                print(json.dumps(result))
            return
        result = ALL_CONFIGS[name]()
    else:
        kwargs = {}
        if "--path" in sys.argv:
            kwargs["path"] = sys.argv[sys.argv.index("--path") + 1]
        if "--batch" in sys.argv:
            kwargs["batch"] = int(sys.argv[sys.argv.index("--batch") + 1])
        result = bench_offline_vqt(**kwargs)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
