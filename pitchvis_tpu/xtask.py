"""Developer task runner (the reference's cargo-xtask equivalent,
xtask/src/main.rs:14-39):

    python -m pitchvis_tpu.xtask check         # import + compile sanity
    python -m pitchvis_tpu.xtask test [args]   # run the test suite
    python -m pitchvis_tpu.xtask bench [args]  # run bench.py
    python -m pitchvis_tpu.xtask build-native  # build the C++ runtime
    python -m pitchvis_tpu.xtask golden        # regenerate golden files
    python -m pitchvis_tpu.xtask warm [args]   # precompile serving into the
                                               # persistent compile cache
    python -m pitchvis_tpu.xtask clean         # remove caches/artifacts
    python -m pitchvis_tpu.xtask train-demo    # one-command realistic-scale
                                               # training run (train/corpus.py;
                                               # --tuned recipe, --full =
                                               # reference corpus scale)
    python -m pitchvis_tpu.xtask soak [args]   # sustained capacity soak with
                                               # churn + live rebuild
    python -m pitchvis_tpu.xtask longhaul      # 30-60 min serving stability
                                               # run (per-minute RSS/device
                                               # memory/cadence; bench/longhaul.py)

`bench --check` is the perf regression gate: re-runs every committed
BENCH_SWEEP.json config and exits nonzero on any best-of-N result below
0.4x the committed median (beyond the host's ~2x throttle envelope).
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


def warm(args) -> int:
    """Pays the serving-step jit compile ONCE into the persistent cache
    (utils/compile_cache.py) so every later server/demo process starts in
    seconds instead of minutes. Flags: --streams N (default 512),
    --path {time,freq,pallas} (default pallas), --fast, --fused (also ML +
    LED stages), --small (reduced params; CI smoke)."""
    code = (
        "import sys, time\n"
        "import numpy as np\n"
        "from pitchvis_tpu.utils.compile_cache import enable_compilation_cache\n"
        "print('compile cache:', enable_compilation_cache())\n"
        "from pitchvis_tpu.core.config import VqtParameters, VqtRange\n"
        "from pitchvis_tpu.models.pipeline import StreamingPipeline\n"
        "a = sys.argv[1:]\n"
        "def opt(name, default=None):\n"
        "    for i, arg in enumerate(a):\n"
        "        if arg == name:\n"
        "            if i + 1 >= len(a):\n"
        "                sys.exit(f'{name} needs a value')\n"
        "            return a[i + 1]\n"
        "        if arg.startswith(name + '='):\n"
        "            return arg.split('=', 1)[1]\n"
        "    return default\n"
        "n = int(opt('--streams', '512'))\n"
        "params = (VqtParameters(n_fft=2048, range=VqtRange(min_freq=220.0, octaves=3, buckets_per_octave=12))\n"
        "          if '--small' in a else VqtParameters())\n"
        "kw = dict(path=opt('--path', 'pallas'), fast='--fast' in a)\n"
        "if '--fused' in a:\n"
        "    import jax\n"
        "    from pitchvis_tpu.models.pitch_mlp import PitchMLP, DEFAULT_T\n"
        "    model = PitchMLP(input_bins=DEFAULT_T * params.n_buckets)\n"
        "    mp = model.init(jax.random.PRNGKey(0), np.zeros((1, 1, DEFAULT_T * params.n_buckets), np.float32))\n"
        "    kw.update(ml_model=model, ml_params=mp, with_led=True)\n"
        "pipe = StreamingPipeline(n, params, **kw)\n"
        "hop = int(params.sr / 60.0)\n"
        "t0 = time.perf_counter()\n"
        "out = pipe.step(np.zeros((n, hop), np.float32), hop / params.sr)\n"
        "np.asarray(out.x_vqt.ravel()[0])  # element fetch: the repo's hard barrier rule\n"
        "print(f'warmed pipeline step ({n} streams, {kw[\"path\"]}'\n"
        "      f'{\", fast\" if kw[\"fast\"] else \"\"}): {time.perf_counter()-t0:.1f}s')\n"
        "# the StreamServer deployment shape uses a DIFFERENT program (the\n"
        "# fused delta-ingest hop); warm a real server so `demo --serve` /\n"
        "# StreamServer processes also start fast\n"
        "from pitchvis_tpu.runtime.native import available\n"
        "if available():\n"
        "    import jax\n"
        "    from pitchvis_tpu.runtime.server import StreamServer\n"
        "    t0 = time.perf_counter()\n"
        "    srv = StreamServer(n, params, buffer_seconds=1.0, **kw)\n"
        "    srv.push(0, np.zeros(hop, np.float32))\n"
        "    out, _ = srv.step(dt=hop / params.sr)\n"
        "    leaves = [l for l in jax.tree.leaves(out) if hasattr(l, 'ravel')]\n"
        "    np.asarray(leaves[0].ravel()[0])\n"
        "    print(f'warmed server step ({n} streams): {time.perf_counter()-t0:.1f}s')\n"
        "    # step_multi compiles a third program (the scan-amortized hop\n"
        "    # the serve loop's throughput mode and capacity serving use)\n"
        "    t0 = time.perf_counter()\n"
        "    out, _ = srv.step_multi(8)\n"
        "    leaves = [l for l in jax.tree.leaves(out) if hasattr(l, 'ravel')]\n"
        "    np.asarray(leaves[0].ravel()[0])\n"
        "    srv.close()\n"
        "    print(f'warmed server step_multi(8): {time.perf_counter()-t0:.1f}s')\n"
        "else:\n"
        "    print('server warm skipped: native runtime unavailable')\n"
    )
    return _run([sys.executable, "-c", code, *args])


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
    if cmd == "warm":
        return warm(rest)
    if cmd == "clean":
        return clean()
    if cmd == "train-demo":
        from .train.corpus import main as corpus_main

        return corpus_main(rest)
    if cmd == "soak":
        from .bench.soak import main as soak_main

        return soak_main(rest)
    if cmd == "longhaul":
        from .bench.longhaul import main as longhaul_main

        return longhaul_main(rest)
    print(f"unknown task {cmd!r}")
    print(__doc__)
    return 2


if __name__ == "__main__":
    sys.exit(main())
