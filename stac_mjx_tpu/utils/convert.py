"""Mocap format conversion: DANNCE .mat → NWB (ndx-pose layout) + inspection.

First-party equivalent of the reference's conversion notebooks
(``demos/Mat-to-Nwb.ipynb``, ``demos/Mat-to-Nwb-Synth-Data.ipynb``) and of
``demos/view_nwb.ipynb``. The reference builds NWB files through
pynwb/ndx-pose; pynwb is not a runtime dependency here, so the writer emits
the ndx-pose HDF5 layout directly with h5py — the exact tree the reference's
pynwb reader (stac_mjx/io.py:127-147) and our ``io.load_nwb`` both consume:

    processing/behavior/PoseEstimation/
        nodes                  (K,) str       keypoint names
        edges                  (0,) uint8
        <node>/data            (F, 3) float   world xyz per frame
        <node>/confidence      (F,) float
        <node>/timestamps      (F,) float
        <node>/reference_frame ()  str

Root-level ``identifier`` / ``session_description`` / ``session_start_time``
datasets are written for NWB-shape compatibility, plus best-effort
``nwb_version`` / ``namespace`` / ``neurodata_type`` attributes.

CAVEAT (honesty): the output is the ndx-pose HDF5 *layout*, not a
schema-complete NWB file — it omits the embedded ``specifications`` group,
per-object ``object_id`` UUIDs, and the full hdmf attribute set, so strict
readers (``pynwb.NWBHDF5IO`` with validation) may reject it. It is intended
for this pipeline's loaders (``io.load_nwb``) and dataset-path-based
consumers; produce archival NWB with pynwb/ndx-pose on a machine where they
install (the reference's Mat-to-Nwb.ipynb workflow).
"""

from __future__ import annotations

from pathlib import Path

import h5py
import numpy as np

_PE_PATH = "processing/behavior/PoseEstimation"


def save_nwb(
    nwb_path,
    data: np.ndarray,
    node_names: list,
    *,
    fps: float = 50.0,
    session_description: str = "STAC mocap keypoints",
    identifier: str = "stac-mjx-tpu",
    reference_frame: str = "world",
) -> Path:
    """Write keypoints [frames, xyz, keypoints] as an ndx-pose-layout file.

    The result round-trips through ``io.load_nwb`` (and the reference's
    pynwb-level reader reads the same datasets).
    """
    data = np.asarray(data, dtype=np.float64)
    if data.ndim != 3 or data.shape[1] != 3:
        raise ValueError(
            f"expected data [frames, xyz, keypoints], got {data.shape}"
        )
    if data.shape[2] != len(node_names):
        raise ValueError(
            f"{data.shape[2]} keypoints in data but {len(node_names)} names"
        )
    n_frames = data.shape[0]
    timestamps = np.arange(n_frames, dtype=np.float64) / fps

    nwb_path = Path(nwb_path)
    str_t = h5py.string_dtype(encoding="utf-8")
    with h5py.File(nwb_path, "w") as f:
        # Best-effort nwb-schema attributes (see module CAVEAT: layout, not
        # a schema-complete NWB — strict pynwb validation may still reject).
        f.attrs["nwb_version"] = "2.6.0"
        f.attrs["namespace"] = "core"
        f.attrs["neurodata_type"] = "NWBFile"
        f.create_dataset("identifier", data=identifier, dtype=str_t)
        f.create_dataset(
            "session_description", data=session_description, dtype=str_t
        )
        f.create_dataset(
            "session_start_time",
            data="1970-01-01T00:00:00+00:00",
            dtype=str_t,
        )
        pe = f.create_group(_PE_PATH)
        pe.attrs["namespace"] = "ndx-pose"
        pe.attrs["neurodata_type"] = "PoseEstimation"
        pe.create_dataset(
            "nodes", data=np.array(node_names, dtype=object), dtype=str_t
        )
        pe.create_dataset("edges", data=np.zeros((0,), dtype=np.uint8))
        pe.create_dataset(
            "description", data="keypoint pose estimation", dtype=str_t
        )
        pe.create_dataset("source_software", data="stac-mjx-tpu", dtype=str_t)
        for k, name in enumerate(node_names):
            g = pe.create_group(str(name))
            g.create_dataset("data", data=data[:, :, k])
            g.create_dataset(
                "confidence", data=np.ones(n_frames, dtype=np.float64)
            )
            g.create_dataset("timestamps", data=timestamps)
            g.create_dataset(
                "reference_frame", data=reference_frame, dtype=str_t
            )
    return nwb_path


def mat_to_nwb(
    mat_path,
    nwb_path,
    names_path=None,
    node_names: list | None = None,
    *,
    fps: float = 50.0,
    **kwargs,
) -> Path:
    """Convert a DANNCE .mat recording ('pred' key, mm) to NWB layout.

    Parity surface of the reference's Mat-to-Nwb notebooks: keypoint names
    come from an optional label3d ``names_path`` (``joint_names`` cell array)
    or an explicit ``node_names`` list; otherwise ``kp_0..kp_{K-1}``. Values
    are written unscaled (still mm) — scaling stays a load-time concern
    (MOCAP_SCALE_FACTOR), as in the reference pipeline.
    """
    from stac_mjx_tpu import io

    data, mat_names = io.load_dannce(mat_path, names_filename=names_path)
    data = np.asarray(data, dtype=np.float64)
    names = node_names or mat_names
    if names is None:
        names = [f"kp_{i}" for i in range(data.shape[2])]
    return save_nwb(nwb_path, data, list(names), fps=fps, **kwargs)


def describe_nwb(path) -> dict:
    """Summarize an ndx-pose NWB file (the view_nwb.ipynb equivalent).

    Returns {nodes, n_frames, duration_s, per-node shapes} and prints a
    human-readable tree.
    """
    with h5py.File(path, "r") as f:
        pe = f[_PE_PATH]
        nodes = [
            n.decode() if isinstance(n, bytes) else str(n)
            for n in pe["nodes"][:]
        ]
        info = {"path": str(path), "nodes": nodes, "series": {}}
        for name in nodes:
            g = pe[name]
            ts = g["timestamps"][:] if "timestamps" in g else None
            info["series"][name] = {
                "shape": tuple(g["data"].shape),
                "duration_s": (
                    float(ts[-1] - ts[0]) if ts is not None and len(ts) else 0.0
                ),
            }
        info["n_frames"] = (
            info["series"][nodes[0]]["shape"][0] if nodes else 0
        )
    print(f"{info['path']}: {len(nodes)} keypoints, {info['n_frames']} frames")
    for name, s in info["series"].items():
        print(f"  {name}: data{s['shape']} ({s['duration_s']:.2f}s)")
    return info
