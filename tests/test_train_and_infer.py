"""End-to-end train-step and streaming-inference tests (CPU mesh)."""
import numpy as np
import jax
import jax.numpy as jnp

from cdfo_tpu.config import ModelConfig, TrainConfig
from cdfo_tpu.models import CVSRV8
from cdfo_tpu.infer.pipeline import StreamingInferencer, synthetic_sequence
from cdfo_tpu.train.state import create_train_state, make_schedule, train_step


def tiny_batch(b=2, n=7, h=16, w=16):
    r = np.random.RandomState(0)
    return {
        "lrs": r.rand(b, n, h, w, 1).astype(np.float32),
        "mvs0": (r.randn(b, n, h, w, 2) * 0.3).astype(np.float32),
        "mvs1": (r.randn(b, n, h, w, 2) * 0.3).astype(np.float32),
        "pms": r.rand(b, n, h, w, 1).astype(np.float32),
        "rms": (r.rand(b, n, h, w, 1).astype(np.float32) - 0.5) * 0.1,
        "ufs": r.rand(b, n, h, w, 1).astype(np.float32),
        "hr": r.rand(b, 4 * h, 4 * w, 1).astype(np.float32),
    }


def test_train_step_reduces_loss():
    model = CVSRV8(ModelConfig(scn_groups=1, mask_mode="sample"))
    batch = tiny_batch()
    state = create_train_state(model, TrainConfig(lr=1e-3), batch)
    step = jax.jit(train_step)
    rng = jax.random.PRNGKey(0)
    _, loss0 = step(state, batch, rng)
    for i in range(8):
        state, loss = step(state, batch, jax.random.fold_in(rng, i))
    assert float(loss) < float(loss0)
    assert np.isfinite(float(loss))


def test_multistep_schedule():
    cfg = TrainConfig(lr=1e-4, milestones=(2000,), gamma=0.5)
    sched = make_schedule(cfg, steps_per_epoch=10)
    np.testing.assert_allclose(float(sched(0)), 1e-4, rtol=1e-6)
    np.testing.assert_allclose(float(sched(19999)), 1e-4, rtol=1e-6)
    np.testing.assert_allclose(float(sched(20000)), 5e-5, rtol=1e-6)


def test_streaming_inference_matches_full_window():
    """Streaming (cached) inference must produce identical SR frames to
    running every window from scratch (`SIDECVSR_our.py:4416-4427`)."""
    model = CVSRV8(ModelConfig(scn_groups=1, mask_mode="expected"))
    data = synthetic_sequence(t=6, h=16, w=24)
    dummy = np.zeros((1, 7, 16, 24, 1), np.float32)
    dmv = np.zeros((1, 7, 16, 24, 2), np.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), dummy, dmv, dmv,
                                 dummy, dummy, dummy)
    inf = StreamingInferencer(model, params)
    frames_streaming, _ = inf.run_sequence(data)

    # no-cache oracle: every window embedded from scratch
    fwd = jax.jit(model.apply)
    frames_full = []
    for i in range(data.num_frames):
        window = inf._build_window(data, i)
        sr, _ = fwd(params, *window)
        img = np.clip(np.asarray(sr)[0, :, :, 0], 0, 1) * 255
        frames_full.append(img.astype(np.uint8))
    frames_full = np.stack(frames_full)

    mismatch = (frames_streaming != frames_full).mean()
    assert mismatch < 1e-3, f"streaming diverges from full-window: {mismatch}"


def test_inferencer_output_geometry():
    model = CVSRV8(ModelConfig(scn_groups=1, mask_mode="expected"))
    data = synthetic_sequence(t=3, h=16, w=24)
    dummy = np.zeros((1, 7, 16, 24, 1), np.float32)
    dmv = np.zeros((1, 7, 16, 24, 2), np.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), dummy, dmv, dmv,
                                 dummy, dummy, dummy)
    frames, fps = StreamingInferencer(model, params).run_sequence(
        data, collect_timing=True)
    assert frames.shape == (3, 64, 96)
    assert frames.dtype == np.uint8
    assert fps is None or fps > 0
