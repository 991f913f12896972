"""Visualization: render fitted results with the host-side MuJoCo renderer.

The render path stays on the host CPU + OpenGL exactly as in the reference
(stac_mjx/stac.py:505-658, stac_mjx/viz.py): a render spec adds worldbody
keypoint sites, per-keypoint "_new" offset sites, and optional error tendons;
frames are produced by mj_fwdPosition + mujoco.Renderer and streamed to mp4.
"""

from __future__ import annotations

import os
from pathlib import Path

import numpy as np

from stac_mjx_tpu import io
from stac_mjx_tpu.models.builder import build_body_spec


def _ensure_headless_gl() -> None:
    """Default to EGL off-screen rendering when no display is available.

    The reference documents this as a manual install step (README.md:79-96 /
    install_graphics.sh there); here headless hosts just work. Must run
    before the first ``import mujoco`` in the process to take effect.
    """
    if "MUJOCO_GL" not in os.environ and not os.environ.get("DISPLAY"):
        os.environ["MUJOCO_GL"] = "egl"


def build_render_model(
    stac, offsets, show_marker_error: bool = False, height: int = 0, width: int = 0
):
    """Compile a render model with keypoint + new-offset sites.

    Parity: stac_mjx/stac.py:505-567 (random sub-mm initial keypoint site
    positions, group assignments, tendons wrapping kp<->marker pairs).
    height/width grow the offscreen framebuffer when the model XML's visual
    defaults are smaller than the requested render size.
    """
    import mujoco

    cfg_model = stac.cfg.model
    render_spec = build_body_spec(stac._xml_path, cfg_model)
    if width > render_spec.visual.global_.offwidth:
        render_spec.visual.global_.offwidth = width
    if height > render_spec.visual.global_.offheight:
        render_spec.visual.global_.offheight = height
    marker_size = float(cfg_model.MARKER_SIZE)

    keypoint_site_names = []
    for name in cfg_model.KEYPOINT_MODEL_PAIRS.keys():
        start = (np.random.rand(3) - 0.5) * 0.001
        rgba = cfg_model.KEYPOINT_COLOR_PAIRS[name]
        if isinstance(rgba, str):
            rgba = [float(c) for c in rgba.split(" ")]
        site_name = name + "_kp"
        keypoint_site_names.append(site_name)
        render_spec.worldbody.add_site(
            name=site_name,
            size=[marker_size] * 3,
            rgba=rgba,
            pos=start,
            group=2,
        )

    offsets = np.asarray(offsets).reshape((-1, 3))
    for (key, v), pos in zip(cfg_model.KEYPOINT_MODEL_PAIRS.items(), offsets):
        parent = render_spec.body(v)
        parent.add_site(
            name=key + "_new",
            size=[marker_size] * 3,
            rgba=[0, 0, 0, 1],
            pos=pos,
            group=2,
        )

    if show_marker_error:
        for key, v in cfg_model.KEYPOINT_MODEL_PAIRS.items():
            tendon = render_spec.add_tendon(
                name=key + "-" + v,
                width=0.001,
                rgba=[1.0, 0.0, 0.0, 1.0],
                limited=0,
            )
            tendon.wrap_site(key + "_kp")
            tendon.wrap_site(key + "_new")

    render_mj_model = render_spec.compile()
    keypoint_site_idxs = [
        mujoco.mj_name2id(render_mj_model, mujoco.mjtObj.mjOBJ_SITE, name)
        for name in keypoint_site_names
    ]
    return render_mj_model, keypoint_site_idxs


def render_stac(
    stac,
    qposes,
    kp_data,
    offsets,
    n_frames: int,
    save_path,
    start_frame: int = 0,
    camera=0,
    height: int = 1200,
    width: int = 1920,
    show_marker_error: bool = False,
):
    """Render fitted results as a video (parity: stac_mjx/stac.py:569-658)."""
    _ensure_headless_gl()
    import imageio
    import mujoco

    qposes = np.asarray(qposes)
    kp_data = np.asarray(kp_data)

    if qposes.shape[0] != kp_data.shape[0]:
        raise ValueError(
            f"Length of qposes ({qposes.shape[0]}) is not equal to the "
            f"length of kp_data({kp_data.shape[0]})"
        )
    if start_frame < 0 or start_frame > kp_data.shape[0]:
        raise ValueError(
            f"start_frame ({start_frame}) must be non-negative and less than "
            f"the length of kp_data ({kp_data.shape[0]})"
        )
    if start_frame + n_frames > kp_data.shape[0]:
        raise ValueError(
            f"start_frame + n_frames ({start_frame} + {n_frames}) must be "
            f"less than the length of given qposes and kp_data ({kp_data.shape[0]})"
        )

    render_mj_model, keypoint_site_idxs = build_render_model(
        stac, offsets, show_marker_error, height=height, width=width
    )

    scene_option = mujoco.MjvOption()
    scene_option.geomgroup[1] = 0
    scene_option.geomgroup[2] = 1
    scene_option.sitegroup[2] = 1
    scene_option.sitegroup[3] = 0
    scene_option.flags[mujoco.mjtVisFlag.mjVIS_TRANSPARENT] = True
    scene_option.flags[mujoco.mjtVisFlag.mjVIS_LIGHT] = True
    scene_option.flags[mujoco.mjtVisFlag.mjVIS_CONVEXHULL] = True
    scene_option.flags[mujoco.mjtRndFlag.mjRND_SHADOW] = True
    scene_option.flags[mujoco.mjtRndFlag.mjRND_REFLECTION] = True
    scene_option.flags[mujoco.mjtRndFlag.mjRND_SKYBOX] = True
    scene_option.flags[mujoco.mjtRndFlag.mjRND_FOG] = True

    mj_data = mujoco.MjData(render_mj_model)
    mujoco.mj_kinematics(render_mj_model, mj_data)
    renderer = mujoco.Renderer(render_mj_model, height=height, width=width)

    kp_data = kp_data[: qposes.shape[0]]
    kp_data = kp_data[start_frame : start_frame + n_frames]
    qposes = qposes[start_frame : start_frame + n_frames]

    frames = []
    fps = int(stac.cfg.model.RENDER_FPS)
    for qpos, kps in zip(qposes, kp_data):
        render_mj_model.site_pos[keypoint_site_idxs] = np.reshape(kps, (-1, 3))
        mj_data.qpos = qpos
        mujoco.mj_fwdPosition(render_mj_model, mj_data)
        renderer.update_scene(mj_data, camera=camera, scene_option=scene_option)
        frames.append(renderer.render())
    _write_video(save_path, frames, fps)
    return frames


def _write_video(save_path, frames, fps: int) -> None:
    """Stream frames to disk: imageio/ffmpeg when available, else OpenCV."""
    import imageio

    try:
        with imageio.get_writer(save_path, fps=fps) as video:
            for f in frames:
                video.append_data(f)
    except (ValueError, ImportError):
        import cv2

        h, w = frames[0].shape[:2]
        out = cv2.VideoWriter(
            str(save_path), cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, h)
        )
        try:
            for f in frames:
                out.write(cv2.cvtColor(f, cv2.COLOR_RGB2BGR))
        finally:
            out.release()


def viz_stac(
    data_path,
    n_frames: int,
    save_path,
    start_frame: int = 0,
    camera=0,
    height: int = 1200,
    width: int = 1920,
    base_path: Path | None = None,
    show_marker_error: bool = False,
):
    """Render FK from a STAC output file (parity: stac_mjx/viz.py:10-61)."""
    from stac_mjx_tpu.stac import Stac
    from stac_mjx_tpu.utils.assets import resolve_asset

    cfg, d = io.load_stac_data(data_path)
    if base_path is None:
        base_path = Path.cwd()
    xml_path = Path(base_path) / cfg.model.MJCF_PATH
    if not xml_path.exists():
        xml_path = resolve_asset(cfg.model.MJCF_PATH, base_path)

    stac = Stac(xml_path, cfg, d.kp_names)
    return cfg, render_stac(
        stac,
        d.qpos,
        d.kp_data,
        d.offsets,
        n_frames,
        save_path,
        start_frame,
        camera,
        height,
        width,
        show_marker_error,
    )
