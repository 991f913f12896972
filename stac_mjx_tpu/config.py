"""Config system: YAML composition + dataclass schema validation.

First-party replacement for the reference's Hydra/OmegaConf stack
(stac_mjx/config.py:73-88), with the same user-facing behavior:

- a root config with a ``defaults`` list composes group files from
  ``<config_dir>/<group>/<name>.yaml`` (Hydra defaults-list semantics for the
  subset the reference uses: ``stac``/``model`` groups + ``_self_``);
- overrides: ``group=name`` swaps a group file, ``a.b.c=value`` sets a dotted
  key (values YAML-parsed), ``+a.b=value`` adds a new key;
- the merged config is validated against the `Config` dataclass schema
  (unknown keys rejected, missing required keys reported), matching
  ``OmegaConf.merge(structured(Config), cfg)``.

The reference's config *files* (configs/{config.yaml,model/*,stac/*}) are
drop-in compatible — the same directory tree loads unchanged.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any, Iterable, Optional

import yaml

_MISSING = object()


@dataclass
class ModelConfig:
    """Body-model configuration (schema parity: stac_mjx/config.py:11-36)."""

    MJCF_PATH: str
    FTOL: float
    ROOT_FTOL: float  # declared but unused, as in the reference
    LIMB_FTOL: float  # declared but unused, as in the reference
    N_ITERS: int
    N_ITER_Q: int
    KP_NAMES: Optional[list] = None
    KEYPOINT_MODEL_PAIRS: dict = field(default_factory=dict)
    KEYPOINT_INITIAL_OFFSETS: dict = field(default_factory=dict)
    ROOT_OPTIMIZATION_KEYPOINT: Any = _MISSING
    TRUNK_OPTIMIZATION_KEYPOINTS: list = field(default_factory=list)
    INDIVIDUAL_PART_OPTIMIZATION: Any = _MISSING
    KEYPOINT_COLOR_PAIRS: dict = field(default_factory=dict)
    SCALE_FACTOR: float = 1.0
    MOCAP_SCALE_FACTOR: float = 1.0
    SITES_TO_REGULARIZE: Optional[list] = None
    RENDER_FPS: int = 50
    N_SAMPLE_FRAMES: int = 100
    M_REG_COEF: float = 1.0
    MARKER_SIZE: float = 0.005
    KP_NAMES_LABEL3D_PATH: Optional[str] = None


@dataclass
class MujocoConfig:
    """MuJoCo solver options (kept for config-file compatibility)."""

    solver: str = "newton"
    iterations: int = 1
    ls_iterations: int = 4


@dataclass
class StacConfig:
    """Pipeline configuration (schema parity: stac_mjx/config.py:48-62)."""

    fit_offsets_path: str
    ik_only_path: str
    data_path: str
    n_fit_frames: int
    skip_fit_offsets: bool = False
    skip_ik_only: bool = False
    infer_qvels: bool = False
    n_frames_per_clip: int = 1
    num_clips: int = 1
    continuous: bool = False
    mujoco: MujocoConfig = field(default_factory=MujocoConfig)
    # TPU-native extensions (absent keys default; reference files still load):
    pose_mode: str = "sequential"  # "sequential" (parity) | "lockstep"
    # "pg" (robust f32) | "pg-jaxopt" (jaxopt-0.8.5-exact, parity goldens)
    # | "gn" (GN + linesearch) | "gn-lm" (flat LM, lockstep throughput)
    q_solver: str = "pg"
    skip_part_opt: bool = False  # drop per-part refinement solves (gn mode)
    fk_impl: str = "scan"  # "scan" (O(depth)) | "jump" (pointer doubling)
    spd_impl: str = "auto"  # GN normal-eq solve: "auto"|"pallas"|"xla"
    # Batched flat-LM early exit: a lane improving its loss by <= FTOL^2
    # for this many consecutive iterations freezes (per lane, so batch
    # composition cannot change results); the loop exits when all lanes
    # are frozen. MEASURED on the v5e flagship workloads to be a strict
    # loss and therefore DISABLED by default: lockstep lanes pay for the
    # vectorized sweep whether frozen or not, the while_loop only exits
    # when every lane froze (never happens before maxiter with 10k lanes
    # — bench mfu leg: early_exit_iters_run == maxiter, fps -5%), and a
    # lane freezing after stall_iters consecutive REJECTED LM steps skips
    # the damping adaptation that would have made progress (+0.08 mm ik
    # residual at 3). Opt in (>0) only for small warm-started batches
    # where all lanes genuinely converge early.
    gn_stall_iters: int = 0
    # Flat-LM damping adaptation: "nielsen" (gain-ratio rule, Madsen-
    # Nielsen-Tingleff alg. 3.16, with f32-safety adaptations — see
    # ops/gn_ik.py) or "fixed" (lam x10 on reject, x0.2 on accept).
    # Measured on the v5e rodent ik workload (same fps at equal
    # iterations): nielsen residual 2.169/2.109/2.083/2.074 mm at
    # 10/12/14/16 iters vs fixed 2.621/2.402/2.264/2.176 — nielsen
    # strictly dominates, so it is the default.
    gn_damping_rule: str = "nielsen"
    # Flat-LM iteration cap: 0 = auto (min(N_ITER_Q, 14) — the measured
    # knee of the nielsen quality/throughput curve: 62k frames/s/chip at
    # 2.083 mm vs 56k at 2.074 mm with 16). Explicit values win.
    gn_iters: int = 0
    # Hierarchical (multigrid-in-time) lockstep ik: cold-solve every
    # ik_hier_stride-th frame at the full budget, interpolate seeds
    # (quaternion-aware nlerp, including the root translation — kept, not
    # overwritten by the raw root keypoint; measured better exactly where
    # seeds matter, see below) for all frames, refine warm in
    # ik_hier_fine_iters (0 = auto). Per-frame iteration cost drops from
    # gn_iters to ~gn_iters/stride + fine_iters; mocap's slow inter-frame
    # motion makes the seeds near-optimal. NOT bitwise-identical to the
    # flat schedule (different warm starts) — quality is measured per
    # workload; 0/1 disables (the default: flat schedule). gn-lm
    # lockstep ik only. Swept r5 (v5e, 10k-frame rodent, fitted offsets,
    # device-only, k-fps @ mm; flat = 64.3 @ 2.0403):
    #   stride:   8       12      16      25      50
    #   fine 5:  117.6@2.0270  123.3@2.0465   -       -       -
    #   fine 6:  106.3@2.0211  107.4@2.0357  114.7@2.0476  110.2@2.0722  113.8@2.1214
    #   fine 8:     -          89.9@2.0272   94.2@2.0359   90.9@2.0437   93.7@2.0610
    #   fine 10:    -             -             -          80.3@2.0307      -
    # Short strides give better seeds (shorter interpolation spans), so
    # LESS fine work reaches BETTER residuals: stride 8 / fine 6 (the
    # bench config) strictly dominates flat and every other swept point
    # on residual; stride 12 / fine 5 is the max-throughput point. The
    # interp-kept root-translation seed bought the short-fine regime its
    # quality (kp re-seed at 25/8 measured 2.0662).
    ik_hier_stride: int = 0
    ik_hier_fine_iters: int = 0
    # Lockstep fit: >0 makes pose passes after the first warm-start every
    # frame from its own previous-pass solution (joints + quats; the root
    # translation still re-anchors on the raw root keypoint — the m-phase
    # moves the offsets between passes, so the solved translation is
    # stale: keeping it measured 1.695 vs 1.250 mm, see
    # pipeline.pose_optimization) and run this shorter budget. Measured
    # r5 (v5e rodent, final fit error): 250 frames — warm 10 is a wash
    # (4 840 f/s @ 1.2500 mm vs 4 836 @ 1.2518 off); 1000 frames —
    # warm 10 strictly dominates (9 155 @ 1.5824 vs 7 611 @ 1.5851,
    # +20% fps at equal error; warm 8 is +39% fps but +0.04 mm). Default
    # 0 (off) keeps the reference-shaped 250-frame fit exactly at its
    # full-budget schedule; opt in (10) for >=1000-frame fits.
    # Sequential (parity) fit untouched.
    fit_warm_iters: int = 0
    mesh_axis: Optional[int] = None  # clip-shard device count; None = all
    # ik_only result payload: True returns/transfers qpos+xpos+xquat+markers
    # (the reference's full h5 schema); False returns qpos+errors only —
    # ~6x less D2H traffic on tunnel-attached chips; derive the rest on
    # demand with Stac.compute_full_outputs(qpos).
    ik_return_full: bool = True
    # Same lean-payload option for fit_offsets: False returns offsets +
    # qpos + error statistics only (the resume contract needs nothing
    # more); xpos/xquat/marker_sites are dead-code-eliminated from the
    # program and absent from the D2H pull. Derive them on demand with
    # Stac.compute_full_outputs(qpos).
    fit_return_full: bool = True
    # Single-device ik pipelining: split the clip axis into chunks of this
    # many clips and fetch chunk i's results while chunk i+1 executes (JAX
    # async dispatch overlaps D2H with compute). 0 = auto (a divisor of the
    # clip count near 8 when there are >=16 clips); -1 = off; 1-clip
    # granularity is legal. Ignored on multi-device meshes (the sharded
    # program handles the clip axis there).
    ik_chunk_clips: int = 0
    # Sequential (parity) mode only: split each clip's per-frame lax.scan
    # into segments of this many frames, dispatched host-side with the
    # warm-start carried on device — numerically identical to the single
    # scan (bitwise-asserted in tests) but each program's runtime is
    # bounded, so reference-length clips (250 frames x 400 PG iters, a
    # minutes-long sequential chain as one program) can't kill a
    # watchdogged/tunnel-attached TPU worker. 0 = auto (10-frame segments
    # on accelerators when clips exceed 25 frames; monolithic on CPU);
    # -1 = force monolithic. Ignored in lockstep mode and with wire f16.
    seq_segment_frames: int = 0
    # Successive root-only solves per clip. 0 = auto: the reference's two
    # identical solves (compute_stac.py:64-98) in sequential/parity mode,
    # one in lockstep mode (the duplicate is a measured quality no-op there
    # and costs a full batched solve). Set 1/2 to force.
    root_opt_passes: int = 0
    # Per-part refinement scheduling in lockstep mode. "auto" = "batched"
    # on the throughput solver (pose_mode=lockstep + q_solver=gn-lm: all
    # parts solve in ONE batched sweep from the full-pass result instead of
    # P sequential solves), "sequential" elsewhere (the reference's part
    # p sees part p-1's update, compute_stac.py:233-250). Force with
    # "sequential" | "batched". NOTE: batched materializes a (P*F, ·)
    # sweep — ~P× the full pass's peak HBM working set; the pipeline
    # auto-falls back to sequential past ~32k items (pipeline.py). The
    # resolved schedule is printed once at Stac init.
    part_opt_mode: str = "auto"
    # Host<->device transfer precision for ik_only keypoints/qpos:
    # "float32" (default) or "float16" — mean-centered f16 keypoints up,
    # f16 qpos down (~2x less wire traffic; compute stays f32 on device).
    # On bandwidth-bound links this raises end-to-end throughput; adds
    # <0.1 mm of quantization at mocap scales (tests/test_pipeline.py).
    wire_dtype: str = "float32"


@dataclass
class Config:
    """Combined model + stac configuration."""

    model: ModelConfig
    stac: StacConfig


class ConfigNode:
    """Dict wrapper with attribute access, `in`, and .get().

    Wraps the underlying dict by reference (no copy) so nested mutation
    (``cfg.stac.data_path = ...``) is visible through every view.
    """

    def __init__(self, data: dict):
        object.__setattr__(self, "_data", data)

    def __getattr__(self, key):
        try:
            v = self._data[key]
        except KeyError as e:
            raise AttributeError(key) from e
        return ConfigNode(v) if isinstance(v, dict) else v

    def __setattr__(self, key, value):
        self._data[key] = value

    def __getitem__(self, key):
        v = self._data[key]
        return ConfigNode(v) if isinstance(v, dict) else v

    def __contains__(self, key):
        return key in self._data

    def get(self, key, default=None):
        v = self._data.get(key, default)
        return ConfigNode(v) if isinstance(v, dict) else v

    def keys(self):
        return self._data.keys()

    def items(self):
        for k, v in self._data.items():
            yield k, (ConfigNode(v) if isinstance(v, dict) else v)

    def to_dict(self) -> dict:
        return _deepcopy_dict(self._data)

    def to_yaml(self) -> str:
        return yaml.safe_dump(self.to_dict(), sort_keys=False)

    def __repr__(self):
        return f"ConfigNode({self._data!r})"


def _deepcopy_dict(d: dict) -> dict:
    out = {}
    for k, v in d.items():
        out[k] = _deepcopy_dict(v) if isinstance(v, dict) else v
    return out


def _merge(base: dict, over: dict) -> dict:
    out = dict(base)
    for k, v in over.items():
        if isinstance(v, dict) and isinstance(out.get(k), dict):
            out[k] = _merge(out[k], v)
        else:
            out[k] = v
    return out


def _set_dotted(cfg: dict, dotted: str, value):
    parts = dotted.split(".")
    node = cfg
    for p in parts[:-1]:
        node = node.setdefault(p, {})
        if not isinstance(node, dict):
            raise ValueError(f"Cannot set {dotted}: {p} is not a mapping")
    node[parts[-1]] = value


def _has_dotted(cfg: dict, dotted: str) -> bool:
    node = cfg
    for p in dotted.split("."):
        if not isinstance(node, dict) or p not in node:
            return False
        node = node[p]
    return True


def _schema_has(dotted: str) -> bool:
    """Whether a dotted key names a field of the structured schema.

    Descending into a free-form dict field (e.g. KEYPOINT_MODEL_PAIRS)
    always counts as known — those subtrees are schemaless by design.
    """
    node = Config
    nested = {"model": ModelConfig, "stac": StacConfig, "mujoco": MujocoConfig}
    for part in dotted.split("."):
        if not dataclasses.is_dataclass(node):
            return True
        if part not in _schema_fields(node):
            return False
        node = nested.get(part, dict)
    return True


def _load_yaml(path: Path) -> dict:
    with open(path) as f:
        data = yaml.safe_load(f)
    return data or {}


def _schema_fields(cls) -> dict:
    return {f.name: f for f in dataclasses.fields(cls)}


def _validate_tree(data: dict) -> list[str]:
    """Structured-merge style validation: unknown and missing keys."""
    problems = []
    for key in data:
        if key not in ("model", "stac"):
            problems.append(f"unknown key: {key}")
    for group, cls in (("model", ModelConfig), ("stac", StacConfig)):
        sub = data.get(group)
        if sub is None:
            problems.append(f"missing required group: {group}")
            continue
        fields = _schema_fields(cls)
        for key in sub:
            if key not in fields:
                problems.append(f"unknown key: {group}.{key}")
        for name, f in fields.items():
            required = (
                f.default is dataclasses.MISSING
                and f.default_factory is dataclasses.MISSING
            )
            if name not in sub and required:
                problems.append(f"missing required key: {group}.{name}")
        if group == "stac" and isinstance(sub.get("mujoco"), dict):
            mfields = _schema_fields(MujocoConfig)
            for key in sub["mujoco"]:
                if key not in mfields:
                    problems.append(f"unknown key: stac.mujoco.{key}")
    return problems


def compose_config(
    config_path: Path | str,
    config_name: str = "config",
    overrides: Iterable[str] | None = None,
) -> ConfigNode:
    """Load, compose, override, and validate a config tree.

    Equivalent surface to the reference's compose_config
    (stac_mjx/config.py:73-88); reads the same directory layout.
    """
    config_dir = Path(config_path).resolve()
    root = _load_yaml(config_dir / f"{config_name}.yaml")

    overrides = list(overrides or [])
    # Hydra-style group overrides may replace defaults-list entries.
    group_overrides = {}
    kv_overrides = []
    for ov in overrides:
        if ov.startswith("hydra/"):
            continue  # logging-control overrides: no-ops here
        key, _, val = ov.partition("=")
        add = key.startswith("+")
        key = key.lstrip("+")
        if "." not in key and (config_dir / key / f"{val}.yaml").exists():
            group_overrides[key] = val
        else:
            kv_overrides.append((key, yaml.safe_load(val) if val != "" else None, add))

    cfg: dict = {}
    defaults = root.pop("defaults", None)
    if defaults:
        for entry in defaults:
            if entry == "_self_":
                cfg = _merge(cfg, root)
                continue
            if isinstance(entry, dict):
                [(group, name)] = entry.items()
                name = group_overrides.pop(group, name)
                cfg = _merge(
                    cfg, {group: _load_yaml(config_dir / group / f"{name}.yaml")}
                )
            else:
                cfg = _merge(cfg, _load_yaml(config_dir / f"{entry}.yaml"))
        if "_self_" not in defaults:
            cfg = _merge(cfg, root)
    else:
        cfg = root

    # Group overrides not present in the defaults list still apply.
    for group, name in group_overrides.items():
        cfg = _merge(cfg, {group: _load_yaml(config_dir / group / f"{name}.yaml")})

    for key, val, add in kv_overrides:
        # Hydra-flavored +/plain semantics (relaxed for schema defaults:
        # plain overrides of schema fields absent from the YAML files are
        # allowed, since the dataclass defaults make them always-present
        # conceptually). '+' on an existing key and plain on an unknown key
        # are both rejected — that typo-catching is the point of the prefix.
        present = _has_dotted(cfg, key)
        if add and present:
            raise ValueError(
                f"override '+{key}': key already exists; drop the '+' prefix"
            )
        if not add and not present and not _schema_has(key):
            raise ValueError(
                f"override '{key}': unknown key (neither in the composed "
                f"config nor the schema); to add a new key use '+{key}=...'"
            )
        _set_dotted(cfg, key, val)

    problems = _validate_tree(cfg)
    if problems:
        raise ValueError(
            "Config validation failed:\n  " + "\n  ".join(problems)
        )
    return ConfigNode(cfg)


def config_from_dict(data: dict) -> ConfigNode:
    """Validate an already-composed dict (e.g. loaded from an output h5)."""
    problems = _validate_tree(data)
    if problems:
        raise ValueError(
            "Config validation failed:\n  " + "\n  ".join(problems)
        )
    return ConfigNode(data)
