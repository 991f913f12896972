"""Host-side model build: MJCF -> flat TPU-native kinematic model.

MuJoCo (the C library, via its Python bindings) is used here exactly like a
compiler: `MjSpec.from_file` + site attachment + uniform rescale + `compile()`
produce an `MjModel`, whose arrays are then extracted once into our flat
`KinTopology` (static) + `KinParams` (pytree). Nothing MuJoCo remains in the
hot path — this mirrors the reference's build step
(stac_mjx/stac.py:185-235 `_build_body_spec` / `_init_body_sites`) while
replacing its MJX runtime half entirely.
"""

from __future__ import annotations

import dataclasses
from pathlib import Path

import jax.numpy as jnp
import numpy as np

from stac_mjx_tpu.models.kinematics import KinParams, KinTopology
from stac_mjx_tpu.models.rescale import scale_spec


@dataclasses.dataclass
class FitModel:
    """Everything the pipeline needs about one compiled fitting model."""

    mj_model: "object"  # mujoco.MjModel — host-side only (render/golden tests)
    topo: KinTopology
    params: KinParams
    site_idxs: np.ndarray  # keypoint site indices, ordered like KEYPOINT_MODEL_PAIRS
    is_regularized: np.ndarray  # (K, 3) 0/1 mask (ref: stac_mjx/stac.py:227-233)
    timestep: float


def _parse_pos(pos) -> list[float]:
    if isinstance(pos, str):
        return [float(p) for p in pos.split()]
    return [float(p) for p in pos]


def _prune_missing_meshes(spec, model_dir: Path) -> None:
    """Drop mesh assets whose files don't exist, plus geoms that use them.

    Some upstream model trees ship MJCFs referencing meshes that were never
    committed (e.g. the fruitfly's assets/head_body.obj); meshes are
    visual-only for STAC, so pruning them preserves kinematics while letting
    the spec compile.
    """
    meshdir = Path(spec.meshdir) if spec.meshdir else Path(".")
    if not meshdir.is_absolute():
        meshdir = model_dir / meshdir
    missing = {
        mesh.name
        for mesh in spec.meshes
        if mesh.file and not (meshdir / mesh.file).exists()
    }
    if not missing:
        return
    import mujoco

    for body in spec.bodies:
        for geom in list(body.geoms):
            if geom.type == mujoco.mjtGeom.mjGEOM_MESH and geom.meshname in missing:
                spec.delete(geom)
    for mesh in list(spec.meshes):
        if mesh.name in missing:
            spec.delete(mesh)


def build_body_spec(xml_path: str | Path, cfg_model) -> "object":
    """Fresh MjSpec with one site per keypoint attached to its mapped body.

    Mirrors the reference's `_build_body_spec` (stac_mjx/stac.py:185-207):
    sites named after keypoints, initial offsets from config, then a uniform
    rescale by SCALE_FACTOR.
    """
    import mujoco

    spec = mujoco.MjSpec.from_file(str(xml_path))
    _prune_missing_meshes(spec, Path(xml_path).parent)
    marker_size = float(cfg_model.MARKER_SIZE)
    for key, body_name in cfg_model.KEYPOINT_MODEL_PAIRS.items():
        parent = spec.body(body_name)
        pos = _parse_pos(cfg_model.KEYPOINT_INITIAL_OFFSETS[key])
        parent.add_site(
            name=key,
            size=[marker_size] * 3,
            rgba=(0, 0, 0, 0.8),
            pos=pos,
            group=3,
        )
    return scale_spec(spec, float(cfg_model.SCALE_FACTOR))


def extract_model(mj_model, dtype=jnp.float32) -> tuple[KinTopology, KinParams]:
    """Flatten a compiled MjModel into (static topology, pytree params)."""
    import mujoco

    body_names = [mj_model.body(i).name for i in range(mj_model.nbody)]
    jnt_names = [mj_model.joint(i).name for i in range(mj_model.njnt)]
    site_names = [mj_model.site(i).name for i in range(mj_model.nsite)]

    topo = KinTopology(
        nq=mj_model.nq,
        nv=mj_model.nv,
        nbody=mj_model.nbody,
        nsite=mj_model.nsite,
        njnt=mj_model.njnt,
        body_parentid=mj_model.body_parentid,
        body_jntadr=mj_model.body_jntadr,
        body_jntnum=mj_model.body_jntnum,
        jnt_type=mj_model.jnt_type,
        jnt_qposadr=mj_model.jnt_qposadr,
        jnt_bodyid=mj_model.jnt_bodyid,
        site_bodyid=mj_model.site_bodyid,
        body_names=body_names,
        jnt_names=jnt_names,
        site_names=site_names,
    )
    params = KinParams(
        body_pos=jnp.asarray(mj_model.body_pos, dtype=dtype),
        body_quat=jnp.asarray(mj_model.body_quat, dtype=dtype),
        jnt_axis=jnp.asarray(mj_model.jnt_axis, dtype=dtype),
        jnt_pos=jnp.asarray(mj_model.jnt_pos, dtype=dtype),
        qpos0=jnp.asarray(mj_model.qpos0, dtype=dtype),
        site_pos=jnp.asarray(mj_model.site_pos, dtype=dtype),
        site_quat=jnp.asarray(mj_model.site_quat, dtype=dtype),
    )
    return topo, params


def build_fit_model(xml_path: str | Path, cfg_model, dtype=jnp.float32) -> FitModel:
    """Compile the fitting model and extract flat arrays + site metadata.

    Mirrors the reference's `_init_body_sites` (stac_mjx/stac.py:209-235):
    site index map in KEYPOINT_MODEL_PAIRS key order, plus the per-keypoint
    regularization mask from SITES_TO_REGULARIZE.
    """
    import mujoco

    spec = build_body_spec(xml_path, cfg_model)
    mj_model = spec.compile()

    site_idxs = np.array(
        [
            mujoco.mj_name2id(mj_model, mujoco.mjtObj.mjOBJ_SITE, name)
            for name in cfg_model.KEYPOINT_MODEL_PAIRS.keys()
        ],
        dtype=np.int32,
    )
    reg_set = set(getattr(cfg_model, "SITES_TO_REGULARIZE", None) or [])
    is_regularized = np.array(
        [
            [1.0, 1.0, 1.0] if k in reg_set else [0.0, 0.0, 0.0]
            for k in cfg_model.KEYPOINT_MODEL_PAIRS.keys()
        ],
        dtype=np.float64,
    )

    topo, params = extract_model(mj_model, dtype=dtype)
    return FitModel(
        mj_model=mj_model,
        topo=topo,
        params=params,
        site_idxs=site_idxs,
        is_regularized=is_regularized,
        timestep=float(mj_model.opt.timestep),
    )
