"""Parity tests for the fused Pallas kernels (interpret mode on CPU)
against straight-line XLA compositions of the reference math.

Covers `ops/fused_block2.py` (the whole Block_ — all three scale
branches), `ops/fused_head.py` (subpixel x2 stages + conv_last + bilinear
base) and `ops/fused_groupconv.py` (group-tail conv3x3 + skip).
Reference semantics: `arch/SIDECVSR_our.py:378-406` (Block_),
`:4390-4393,4473-4480` (head), `:430-444` (SCGroup tail).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cdfo_tpu.ops.fused_block import dual_weights
from cdfo_tpu.ops.fused_block2 import fused_scale_block
from cdfo_tpu.ops.fused_groupconv import conv3x3_residual_hcw
from cdfo_tpu.ops.fused_head import fused_head
from cdfo_tpu.ops.resize import interpolate_bilinear as ib


def _conv(t, w, b, pad):
    return jax.lax.conv_general_dilated(
        t, w, (1, 1), ((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + b


def _lrelu(t):
    return jnp.where(t >= 0, t, 0.1 * t)


@pytest.mark.parametrize("shape,rows,wt", [
    ((2, 20, 30, 8), 4, 128),
    ((1, 16, 260, 8), 8, 128),   # multi-tile W
    ((1, 32, 130, 8), 16, 128),
])
def test_fused_scale_block_full_parity(shape, rows, wt):
    rng = np.random.RandomState(0)
    b, h, w, c = shape
    cm = 4 * c
    x = jnp.asarray(rng.randn(*shape).astype(np.float32))
    w1 = jnp.asarray(rng.randn(3, 3, c, cm).astype(np.float32) * 0.1)
    b1 = jnp.asarray(rng.randn(cm).astype(np.float32) * 0.1)
    w2 = jnp.asarray(rng.randn(3, 3, cm, c).astype(np.float32) * 0.1)
    b2 = jnp.asarray(rng.randn(c).astype(np.float32) * 0.1)
    kd = jnp.asarray(rng.randn(1, 1, c, c).astype(np.float32) * 0.3)
    bd = jnp.asarray(rng.randn(c).astype(np.float32) * 0.1)
    ku = jnp.asarray(rng.randn(1, 1, c, c).astype(np.float32) * 0.3)
    bu = jnp.asarray(rng.randn(c).astype(np.float32) * 0.1)

    def body(t):
        return _conv(_lrelu(_conv(t, w1, b1, 1)), w2, b2, 1)

    def down(t):
        return ib(_conv(t, kd, bd, 0), scale_factor=0.5)

    def up(t):
        return ib(_conv(t, ku, bu, 0), scale_factor=2.0)

    ref = x + body(x) + down(body(up(x))) + up(body(down(x)))
    got = fused_scale_block(x, w1, b1, w2, b2, kd, bd, ku, bu,
                            rows=rows, wt=wt)
    rel = float(jnp.max(jnp.abs(ref - got))) / float(jnp.max(jnp.abs(ref)))
    assert rel < 1e-5, rel


@pytest.mark.parametrize("shape", [(2, 16, 24), (1, 12, 140)])
def test_fused_head_parity(shape):
    rng = np.random.RandomState(1)
    b, h, w = shape
    nf = 64
    t = jnp.asarray(rng.randn(b, h, nf, w).astype(np.float32))
    lr = jnp.asarray(rng.rand(b, h, w, 1).astype(np.float32))
    k1 = jnp.asarray(rng.randn(1, 1, nf, 4 * nf).astype(np.float32) * 0.1)
    b1 = jnp.asarray(rng.randn(4 * nf).astype(np.float32) * 0.1)
    k2 = jnp.asarray(rng.randn(1, 1, nf, 4 * nf).astype(np.float32) * 0.1)
    b2 = jnp.asarray(rng.randn(4 * nf).astype(np.float32) * 0.1)
    kl = jnp.asarray(rng.randn(3, 3, nf, 1).astype(np.float32) * 0.1)
    bl = jnp.asarray(rng.randn(1).astype(np.float32) * 0.1)

    def conv1x1(x, k, bb):
        return jnp.einsum("bhwc,co->bhwo", x, k[0, 0]) + bb

    def ps2(x):
        b_, hh, ww, crr = x.shape
        c = crr // 4
        x = x.reshape(b_, hh, ww, c, 2, 2)
        return x.transpose(0, 1, 4, 2, 5, 3).reshape(b_, 2 * hh, 2 * ww, c)

    xn = jnp.transpose(t, (0, 1, 3, 2))
    y = _lrelu(ps2(conv1x1(xn, k1, b1)))
    y = _lrelu(ps2(conv1x1(y, k2, b2)))
    ref = _conv(y, kl, bl, 1) + ib(lr, scale_factor=4.0)

    got = fused_head(t, lr, k1, b1, k2, b2, kl, bl, rows=4, wt=128)
    rel = float(jnp.max(jnp.abs(ref - got))) / float(jnp.max(jnp.abs(ref)))
    assert rel < 1e-5, rel


def test_groupconv_residual_parity():
    rng = np.random.RandomState(2)
    b, h, w, c = 2, 12, 30, 8
    g = jnp.asarray(rng.randn(b, h, w, c).astype(np.float32))
    skip = jnp.asarray(rng.randn(b, h, w, c).astype(np.float32))
    kg = jnp.asarray(rng.randn(3, 3, c, c).astype(np.float32) * 0.1)
    bg = jnp.asarray(rng.randn(c).astype(np.float32) * 0.1)
    ref = skip + _conv(g, kg, bg, 1)

    rows, wt = 4, 128
    gh = jnp.transpose(g, (0, 1, 3, 2))
    sh = jnp.transpose(skip, (0, 1, 3, 2))
    wp = 128
    gp = jnp.pad(gh, ((0, 0), (1, 1), (0, 0), (2, 126 + wp - w)))
    sp = jnp.pad(sh, ((0, 0), (0, 0), (0, 0), (0, wp - w)))
    out = conv3x3_residual_hcw(gp, sp, dual_weights(kg),
                               bg.reshape(-1, 1), img_h=h, img_w=w,
                               rows=rows, wt=wt)
    got = jnp.transpose(out[:, :h, :, :w], (0, 1, 3, 2))
    rel = float(jnp.max(jnp.abs(ref - got))) / float(jnp.max(jnp.abs(ref)))
    assert rel < 1e-5, rel


def test_int8_turbo_block_close_to_exact():
    """The opt-in int8 trunk (config.trunk_int8) tracks the exact kernel
    within quantization tolerance (~1-2% relative)."""
    from cdfo_tpu.ops.fused_block2 import fold_down_conv2, scale_block_hcw
    from cdfo_tpu.ops.fused_block2_q import scale_block_hcw_q

    rng = np.random.RandomState(3)
    B, H, W, C = 1, 16, 30, 8
    CM = 4 * C
    x = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32))
    xh = jnp.transpose(x, (0, 1, 3, 2))
    xp = jnp.pad(xh, ((0, 0), (6, 6), (0, 0), (6, 6)), mode="edge")
    xp = jnp.pad(xp, ((0, 0), (0, 0), (0, 0), (0, 116 + 128 - W)))
    w1 = dual_weights(jnp.asarray(rng.randn(3, 3, C, CM).astype(np.float32) * 0.1))
    b1 = jnp.asarray(rng.randn(CM, 1).astype(np.float32) * 0.1)
    w2hw = jnp.asarray(rng.randn(3, 3, CM, C).astype(np.float32) * 0.1)
    w2 = dual_weights(w2hw)
    b2 = jnp.asarray(rng.randn(C, 1).astype(np.float32) * 0.1)
    w2f = fold_down_conv2(w2hw)
    ku = jnp.asarray(rng.randn(C, C).astype(np.float32) * 0.3)
    bu = jnp.asarray(rng.randn(C, 1).astype(np.float32) * 0.1)
    kd = jnp.asarray(rng.randn(C, C).astype(np.float32) * 0.3)
    bd = jnp.asarray(rng.randn(C, 1).astype(np.float32) * 0.1)
    kw = dict(img_h=H, img_w=W, rows=4, wt=128)
    exact = scale_block_hcw(xp, w1, b1, w2, b2, w2f, ku, bu, kd, bd, **kw)
    turbo = scale_block_hcw_q(xp, w1, b1, w2, b2, w2f, ku, bu, kd, bd, **kw)
    e = np.asarray(exact[:, :H, :, :W], np.float32)
    t = np.asarray(turbo[:, :H, :, :W], np.float32)
    rel = np.abs(e - t).max() / np.abs(e).max()
    corr = np.corrcoef(e.ravel(), t.ravel())[0, 1]
    assert rel < 0.05 and corr > 0.999, (rel, corr)


def test_resblock_pair_tail_parity():
    """`ops/fused_tail.py`: RB2(RB1(t)) + skip[b//nbr] vs straight-line
    XLA (reference `arch/SIDECVSR_our.py:254-271,3492-3494`)."""
    from cdfo_tpu.ops.fused_tail import resblock_pair_hcw

    rng = np.random.RandomState(4)
    bc, nbr, h, w, c = 2, 3, 12, 30, 8
    b = bc * nbr
    t = jnp.asarray(rng.randn(b, h, w, c).astype(np.float32))
    center = jnp.asarray(rng.randn(bc, h, w, c).astype(np.float32))
    ws = [jnp.asarray(rng.randn(3, 3, c, c).astype(np.float32) * 0.1)
          for _ in range(4)]
    bs = [jnp.asarray(rng.randn(c).astype(np.float32) * 0.1)
          for _ in range(4)]

    def rb(x, k1, b1, k2, b2):
        return x + _conv(jnp.maximum(_conv(x, k1, b1, 1), 0.0), k2, b2, 1)

    skip_b = jnp.repeat(center, nbr, axis=0)
    ref = rb(rb(t, ws[0], bs[0], ws[1], bs[1]),
             ws[2], bs[2], ws[3], bs[3]) + skip_b

    rows, wt = 4, 128
    th = jnp.transpose(t, (0, 1, 3, 2))
    tp = jnp.pad(th, ((0, 0), (4, 4), (0, 0), (4, 124 + wt - w)))
    sk = jnp.pad(jnp.transpose(center, (0, 1, 3, 2)),
                 ((0, 0), (0, 0), (0, 0), (0, wt - w)))
    out = resblock_pair_hcw(
        tp, sk,
        dual_weights(ws[0]), bs[0].reshape(-1, 1),
        dual_weights(ws[1]), bs[1].reshape(-1, 1),
        dual_weights(ws[2]), bs[2].reshape(-1, 1),
        dual_weights(ws[3]), bs[3].reshape(-1, 1),
        img_h=h, img_w=w, nbr=nbr, rows=rows, wt=wt)
    got = jnp.transpose(out[:, :h, :, :w], (0, 1, 3, 2))
    rel = float(jnp.max(jnp.abs(ref - got))) / float(jnp.max(jnp.abs(ref)))
    assert rel < 1e-5, rel
