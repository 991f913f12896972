"""Clip batching and overlap crossfade for long recordings.

Behavioral parity with the reference's sequence-axis machinery
(stac_mjx/utils.py:18,351-461): fixed-size clip windows (optionally
overlapping by CONTINUOUS_BATCH_OVERLAP frames, last window wrap-padded) and
the sigmoid crossfade + de-overlap stitch applied in post. In the TPU build
the clip axis is also the shard axis: overlap halos are materialized per clip
so the crossfade stays shard-local (no collectives; SURVEY.md §5.7).
"""

from __future__ import annotations

import numpy as np

CONTINUOUS_BATCH_OVERLAP = 10


def batch_kp_data(kp_data, n_frames_per_clip: int, continuous: bool = False):
    """Reshape (F, K*3) keypoints into (n_clips, clip_frames, K*3).

    Parity: stac_mjx/utils.py:351-389. Non-continuous mode truncates the
    remainder; continuous mode makes windows of n_frames_per_clip + overlap
    with the last window wrap-padded.
    """
    import jax.numpy as jnp

    kp_data = jnp.asarray(kp_data)
    n_frames = n_frames_per_clip
    total_frames = kp_data.shape[0]
    n_batches = int(total_frames // n_frames)
    if n_batches == 0:
        raise ValueError(
            f"recording has {total_frames} frames but "
            f"stac.n_frames_per_clip={n_frames}: need at least one full "
            f"clip; lower n_frames_per_clip or provide more frames"
        )
    if continuous:
        window = n_frames + CONTINUOUS_BATCH_OVERLAP
        if total_frames < window:
            raise ValueError(
                f"continuous mode needs at least n_frames_per_clip + "
                f"{CONTINUOUS_BATCH_OVERLAP} = {window} frames for the "
                f"overlap window, got {total_frames}; lower "
                f"stac.n_frames_per_clip or set stac.continuous=false"
            )
        starts = np.arange(0, n_batches * n_frames, n_frames)
        batches = [kp_data[s : s + window] for s in starts]
        batches[-1] = jnp.pad(
            batches[-1], ((0, CONTINUOUS_BATCH_OVERLAP), (0, 0)), mode="wrap"
        )
        return jnp.stack(batches, axis=0)
    clipped = kp_data[: n_batches * n_frames]
    return clipped.reshape((n_batches, n_frames) + kp_data.shape[1:])


def crossfade_sigmoid(a, b, *, axis=0, center=0.5, steepness=10.0):
    """Numerically-stable sigmoid blend from a to b along an axis."""
    n = a.shape[axis]
    x = np.linspace(0.0, 1.0, n)
    z = steepness * (x - center)
    m = 0.5 * (1.0 + np.tanh(z / 2.0))
    shape = [1] * a.ndim
    shape[axis] = n
    m = m.reshape(shape)
    return (1.0 - m) * a + m * b


def handle_edge_effects(ik_only_data, n_frames_per_clip: int):
    """Crossfade overlapping clip boundaries and stitch (host-side post).

    Parity: stac_mjx/utils.py:393-461 — including the fact that quaternion
    columns are linearly blended like everything else. Operates in-place on a
    StacData and returns it.

    Lean ik payloads (stac.ik_return_full=false) carry empty xpos/xquat/
    marker_sites placeholders; those pass through untouched — the real
    values, derived later from the crossfaded qpos via
    Stac.compute_full_outputs, are automatically consistent.
    """

    def f(data: np.ndarray) -> np.ndarray:
        data = np.array(data)
        if data.size == 0:
            return data
        batched = data.reshape(
            (-1, n_frames_per_clip + CONTINUOUS_BATCH_OVERLAP) + data.shape[1:]
        )
        num_clips = batched.shape[0]
        for i in range(num_clips - 1):
            a = batched[i, -CONTINUOUS_BATCH_OVERLAP:]
            b = batched[i + 1, :CONTINUOUS_BATCH_OVERLAP]
            batched[i, -CONTINUOUS_BATCH_OVERLAP:] = crossfade_sigmoid(a, b, axis=0)

        first = batched[0]
        middle = batched[1:-1, CONTINUOUS_BATCH_OVERLAP:]
        last = batched[-1, CONTINUOUS_BATCH_OVERLAP:-CONTINUOUS_BATCH_OVERLAP]
        middle_flat = middle.reshape((-1,) + middle.shape[2:])
        return np.concatenate([first, middle_flat, last], axis=0)

    ik_only_data.qpos = f(ik_only_data.qpos)
    ik_only_data.kp_data = f(ik_only_data.kp_data)
    ik_only_data.xpos = f(ik_only_data.xpos)
    ik_only_data.xquat = f(ik_only_data.xquat)
    ik_only_data.marker_sites = f(ik_only_data.marker_sites)
    return ik_only_data
