"""Fused packed-attention kernel vs the jnp reference (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp

from deepv_tpu.ops.attention import attention_pallas, attention_reference


def make(b=2, s=70, h=3, d=16, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 3)
    q = jax.random.normal(ks[0], (b, s, h, d), jnp.float32)
    k = jax.random.normal(ks[1], (b, s, h, d), jnp.float32)
    v = jax.random.normal(ks[2], (b, s, h, d), jnp.float32)
    # ctx tokens (time 0) with some masked; then 4 frames of video tokens
    valid = np.ones((b, s), np.int32)
    valid[:, 8:12] = 0  # masked ctx
    times = np.zeros(s, np.float32)
    n_ctx = 14
    per = (s - n_ctx) // 4
    for f in range(4):
        times[n_ctx + f * per: n_ctx + (f + 1) * per] = f
    times[n_ctx + 4 * per:] = 3
    return q, k, v, jnp.asarray(valid), jnp.asarray(times)


def test_pallas_matches_reference():
    q, k, v, valid, times = make()
    ref = attention_reference(q, k, v, valid, times)
    out = attention_pallas(q, k, v, valid, times, block_q=32, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4)


def test_pallas_padding_isolated():
    """Sequence padding (to the q-block multiple) must not leak into real
    tokens: compare s=70 (padded to 96) against itself with different
    padding content via a different block size."""
    q, k, v, valid, times = make(s=70)
    a = attention_pallas(q, k, v, valid, times, block_q=32, interpret=True)
    b = attention_pallas(q, k, v, valid, times, block_q=16, interpret=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5, rtol=1e-4)


def test_pallas_bf16():
    q, k, v, valid, times = make()
    q, k, v = (x.astype(jnp.bfloat16) for x in (q, k, v))
    ref = attention_reference(q, k, v, valid, times)
    out = attention_pallas(q, k, v, valid, times, block_q=32, interpret=True)
    np.testing.assert_allclose(np.asarray(out, np.float32), np.asarray(ref, np.float32),
                               atol=3e-2, rtol=3e-2)


def test_pallas_split_last_matches_reference():
    """n_last splits the attention into [prefix->prefix] + [last->all]
    when the last tokens carry the strictly largest time (the denoise
    loop's current unit); must equal both the jnp reference and the
    unsplit kernel."""
    q, k, v, valid, times = make()
    t = np.asarray(times).copy()
    n_last = 14
    t[-n_last:] = 9.0                       # strictly above every prefix time
    times = jnp.asarray(t)
    ref = attention_reference(q, k, v, valid, times)
    split = attention_pallas(q, k, v, valid, times, block_q=32,
                             interpret=True, n_last=n_last)
    np.testing.assert_allclose(np.asarray(split), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)
    fused = attention_pallas(q, k, v, valid, times, block_q=32, interpret=True)
    np.testing.assert_allclose(np.asarray(split), np.asarray(fused),
                               atol=2e-5, rtol=1e-4)


def test_pallas_split_with_padding_frames():
    """Split with invalid (padding) prefix tokens and a masked ctx group:
    the prefix block's own validity rules must survive the split."""
    q, k, v, valid, times = make(s=96)
    valid = np.asarray(valid).copy()
    t = np.asarray(times).copy()
    valid[:, 20:30] = 0                     # padding frames in the prefix
    n_last = 32
    t[-n_last:] = 7.0
    valid[:, -n_last:] = 1
    valid, times = jnp.asarray(valid), jnp.asarray(t)
    ref = attention_reference(q, k, v, valid, times)
    split = attention_pallas(q, k, v, valid, times, block_q=32,
                             interpret=True, n_last=n_last)
    np.testing.assert_allclose(np.asarray(split), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


def test_vmem_guard_falls_back_above_budget():
    """Beyond the single-pass VMEM budget the wrapper must return the exact
    jnp-path result with an actionable warning instead of dying inside
    Mosaic allocation (VERDICT r2 #7)."""
    import warnings
    from deepv_tpu.ops.attention import (_VMEM_BUDGET_BYTES,
                                         _kernel_vmem_bytes)
    # find an S just over the budget for d=64 f32 at the default block_q
    d, block_q = 64, 256
    s = 128
    while _kernel_vmem_bytes(block_q, s, d, 4) <= _VMEM_BUDGET_BYTES:
        s += 128
    assert _kernel_vmem_bytes(block_q, s - 128, d, 4) <= _VMEM_BUDGET_BYTES
    q, k, v, valid, times = make(s=s, h=1, d=d)
    ref = attention_reference(q, k, v, valid, times)
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        # interpret=False: the guard must trip BEFORE any kernel lowering
        out = attention_pallas(q, k, v, valid, times, block_q=block_q)
    assert any("VMEM" in str(w.message) for w in caught), \
        [str(w.message) for w in caught]
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


def test_vmem_guard_quiet_below_budget():
    """At the deployment packed shape (S~2.1k, d=64) the guard must NOT
    trip — the fused kernel stays the production path."""
    import warnings
    from deepv_tpu.ops.attention import (_VMEM_BUDGET_BYTES,
                                         _kernel_vmem_bytes)
    assert _kernel_vmem_bytes(256, 2176, 64, 4) <= _VMEM_BUDGET_BYTES
