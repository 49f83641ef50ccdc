"""utils/aot.py: the cross-process AOT executable cache.

CPU-backend unit tests for the jit-twin semantics (static splitting,
disk round-trip, fallback paths) plus a tiny-pipeline integration run
proving the cached executables produce the plain-jit pixels. The
full-size TPU measurement lives in scripts/probe_aot.py (round 5:
deserialize 4.0 s + first call 0.02 s vs a fresh remote compile)."""

import glob
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from deepv_tpu.utils import aot


@pytest.fixture
def aot_dir(tmp_path):
    d = str(tmp_path / "aotx")
    aot.configure(d, backend="cpu")
    yield d
    aot.configure(None)


class _NoCompileJit:
    """Delegates lower() (cheap tracing, needed for the content key) but
    fails the test if anything tries to COMPILE."""

    def __init__(self, real):
        self._real = real

    def lower(self, *a, **k):
        lowered = self._real.lower(*a, **k)

        class _L:
            def as_text(self, *a2, **k2):
                return lowered.as_text(*a2, **k2)

            def compile(self):
                raise AssertionError("recompiled instead of loading the "
                                     "AOT cache")

        return _L()

    def __call__(self, *a, **k):
        raise AssertionError("fell back to plain jit")


def _mk_fn():
    @aot.aot_jit(static_argnames=("n",))
    def poly(x, n, y):
        # static 'n' sits BETWEEN dynamic args: exercises positional-static
        # splitting (the pipeline passes mcfg positionally first)
        for _ in range(n):
            x = x @ y + 1.0
        return x
    return poly


def test_passthrough_without_configure(tmp_path):
    aot.configure(None)
    poly = _mk_fn()
    x, y = jnp.ones((4, 4)), jnp.eye(4)
    out = poly(x, 2, y)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x @ y + 1.0) @ y + 1.0)
    assert not glob.glob(str(tmp_path / "*.aotx"))


def test_compile_saves_and_second_process_loads(aot_dir):
    poly = _mk_fn()
    x, y = jnp.arange(16.0).reshape(4, 4), jnp.eye(4) * 2.0
    ref = np.asarray(jax.jit(lambda x, y: (x @ y + 1.0) @ y + 1.0)(x, y))
    out = poly(x, 2, y)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-6)
    files = glob.glob(os.path.join(aot_dir, "poly-*.aotx"))
    assert len(files) == 1, files

    # simulate the fresh process: new _AotFn (empty memo), a jit stub that
    # still lowers (content keying needs the HLO) but refuses to compile —
    # the only way to a correct answer is the disk blob
    poly2 = _mk_fn()
    poly2._jit = _NoCompileJit(poly2._jit)
    out2 = poly2(x, 2, y)
    np.testing.assert_allclose(np.asarray(out2), ref, rtol=1e-6)


def test_static_values_specialize_separately(aot_dir):
    poly = _mk_fn()
    x, y = jnp.ones((4, 4)), jnp.eye(4)
    o1 = poly(x, 1, y)
    o2 = poly(x, 3, y)
    assert not np.allclose(np.asarray(o1), np.asarray(o2))
    assert len(glob.glob(os.path.join(aot_dir, "poly-*.aotx"))) == 2


def test_dtype_and_shape_specialize(aot_dir):
    poly = _mk_fn()
    poly(jnp.ones((4, 4)), 1, jnp.eye(4))
    poly(jnp.ones((8, 8)), 1, jnp.eye(8))
    poly(jnp.ones((4, 4), jnp.bfloat16), 1, jnp.eye(4, dtype=jnp.bfloat16))
    assert len(glob.glob(os.path.join(aot_dir, "poly-*.aotx"))) == 3


def test_unhashable_static_falls_back(aot_dir):
    @aot.aot_jit(static_argnames=("ns",))
    def f(x, ns):
        for n in ns:
            x = x + n
        return x
    # list static is unhashable -> the wrapper must hand off to plain jit,
    # which surfaces its own unhashable-static error (not a keying crash)
    with pytest.raises((TypeError, ValueError)):
        f(jnp.ones((2,)), [1, 2])


def test_mesh_static_bypasses_cache(aot_dir):
    from jax.sharding import Mesh

    @aot.aot_jit(static_argnames=("mesh",))
    def g(x, mesh=None):
        return x * 2

    mesh = Mesh(np.array(jax.devices("cpu")[:2]), ("tp",))
    out = g(jnp.ones((2,)), mesh=mesh)
    np.testing.assert_allclose(np.asarray(out), 2.0)
    assert not glob.glob(os.path.join(aot_dir, "g-*.aotx"))


def test_corrupt_entry_recompiles(aot_dir):
    poly = _mk_fn()
    x, y = jnp.ones((4, 4)), jnp.eye(4)
    ref = np.asarray(poly(x, 2, y))
    path = glob.glob(os.path.join(aot_dir, "poly-*.aotx"))[0]
    with open(path, "wb") as fh:
        fh.write(b"not a pickle")
    poly2 = _mk_fn()   # fresh memo -> hits the corrupt disk entry
    out = poly2(x, 2, y)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-6)
    # the corrupt entry was replaced by a loadable one
    poly3 = _mk_fn()
    poly3._jit = _NoCompileJit(poly3._jit)
    np.testing.assert_allclose(np.asarray(poly3(x, 2, y)), ref, rtol=1e-6)


def test_content_change_misses_cleanly(aot_dir):
    """Same name+signature, different math -> the HLO content key must MISS
    (a signature-only key would silently run the stale executable)."""
    @aot.aot_jit(static_argnames=("n",))
    def h(x, n):
        return x + float(n)
    a = np.asarray(h(jnp.ones((3,)), 2))
    np.testing.assert_allclose(a, 3.0)

    @aot.aot_jit(static_argnames=("n",))   # same __name__ 'h', new body
    def h(x, n):
        return x * float(n)
    b = np.asarray(h(jnp.ones((3,)), 2))
    np.testing.assert_allclose(b, 2.0)
    assert len(glob.glob(os.path.join(aot_dir, "h-*.aotx"))) == 2


def test_tiny_pipeline_outputs_match_plain_jit(aot_dir):
    """Integration: one tiny single-chunk rollout with the AOT cache on
    matches the plain-jit rollout (same device, same programs), and the
    pipeline's hot programs (_denoise_stage, VAE windows) landed on disk."""
    from test_pipeline import make_batch, tiny_pipeline

    aot.configure(None)
    ref = np.asarray(tiny_pipeline().generate(make_batch(), seed=3)["pred_img"])

    aot.configure(aot_dir, backend="cpu")
    out = np.asarray(tiny_pipeline().generate(make_batch(), seed=3)["pred_img"])
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=0)
    names = {os.path.basename(p).split("-")[0]
             for p in glob.glob(os.path.join(aot_dir, "*.aotx"))}
    assert "_denoise_stage" in names, names
    assert {"_dec_window", "_enc_window"} & names, names

    # warm start: a second pipeline in the same cache dir loads every
    # executable (memo tables cleared by configure -> all disk hits)
    aot.configure(aot_dir, backend="cpu")
    out2 = np.asarray(tiny_pipeline().generate(make_batch(), seed=3)["pred_img"])
    np.testing.assert_allclose(out2, ref, atol=2e-5, rtol=0)


def test_per_device_entries(aot_dir):
    """Multi-stream serving: inputs committed to another chip must get their
    own cache entry and execute there (executables bind to devices)."""
    cpus = jax.devices("cpu")

    @aot.aot_jit
    def double(x):
        return x * 2

    x0 = jax.device_put(jnp.ones((4,)), cpus[0])
    x1 = jax.device_put(jnp.ones((4,)), cpus[1])
    o0, o1 = double(x0), double(x1)
    assert list(o0.devices())[0] == cpus[0]
    assert list(o1.devices())[0] == cpus[1]
    np.testing.assert_allclose(np.asarray(o1), 2.0)
    assert len(glob.glob(os.path.join(aot_dir, "double-*.aotx"))) == 2

    # a fresh memo (new process stand-in) loads the cpu1 entry back to cpu1
    aot.configure(aot_dir, backend="cpu")
    o1b = double(x1)
    assert list(o1b.devices())[0] == cpus[1]


def test_stats_and_eviction(tmp_path):
    d = str(tmp_path / "capped")
    aot.configure(d, backend="cpu", max_bytes=1)   # evict everything but new
    poly = _mk_fn()
    x, y = jnp.ones((4, 4)), jnp.eye(4)
    poly(x, 1, y)
    s = aot.stats()
    assert s["compiled"] == 1 and s["loaded"] == 0
    poly(x, 2, y)   # saving the 2nd entry evicts past the 1-byte cap
    assert len(glob.glob(os.path.join(d, "*.aotx"))) == 1
    aot.configure(d, backend="cpu")   # fresh memo: the survivor loads
    poly(x, 2, y)
    assert aot.stats()["loaded"] == 1
    aot.configure(None)
