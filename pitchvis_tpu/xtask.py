"""Developer task runner (the reference's cargo-xtask equivalent,
xtask/src/main.rs:14-39):

    python -m pitchvis_tpu.xtask check         # import + compile sanity
    python -m pitchvis_tpu.xtask test [args]   # run the test suite
    python -m pitchvis_tpu.xtask bench [args]  # run bench.py
    python -m pitchvis_tpu.xtask build-native  # build the C++ runtime
    python -m pitchvis_tpu.xtask golden        # regenerate golden files
    python -m pitchvis_tpu.xtask clean         # remove caches/artifacts
"""

from __future__ import annotations

import os
import shutil
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(cmd, **kw):
    print("+", " ".join(cmd))
    return subprocess.run(cmd, cwd=ROOT, **kw).returncode


def check() -> int:
    code = (
        "import pitchvis_tpu as pv\n"
        "import jax.numpy as jnp\n"
        "from pitchvis_tpu.core.config import VqtParameters, VqtRange\n"
        "p = VqtParameters(n_fft=2048, range=VqtRange(min_freq=220.0, octaves=3, buckets_per_octave=12))\n"
        "v = pv.Vqt(p)\n"
        "out = v.calculate_vqt_batch_in_db(jnp.zeros((2, p.n_fft)))\n"
        "assert out.shape == (2, p.n_buckets)\n"
        "print('check ok:', out.shape)\n"
    )
    return _run([sys.executable, "-c", code])


def test(args) -> int:
    return _run([sys.executable, "-m", "pytest", "tests/", "-q", *args])


def bench(args) -> int:
    return _run([sys.executable, "bench.py", *args])


def build_native() -> int:
    return _run(["make", "-C", "native"])


def golden() -> int:
    return _run([sys.executable, "-m", "pitchvis_tpu.io.golden", "tests/golden"])


def clean() -> int:
    for d in (".cache", "native/libpitchvis_native.so"):
        path = os.path.join(ROOT, d)
        if os.path.isdir(path):
            shutil.rmtree(path)
            print("removed", path)
        elif os.path.exists(path):
            os.remove(path)
            print("removed", path)
    return 0


def main(argv=None) -> int:
    argv = argv if argv is not None else sys.argv[1:]
    if not argv:
        print(__doc__)
        return 2
    cmd, *rest = argv
    if cmd == "check":
        return check()
    if cmd == "test":
        return test(rest)
    if cmd == "bench":
        return bench(rest)
    if cmd == "build-native":
        return build_native()
    if cmd == "golden":
        return golden()
    if cmd == "clean":
        return clean()
    print(f"unknown task {cmd!r}")
    print(__doc__)
    return 2


if __name__ == "__main__":
    sys.exit(main())
