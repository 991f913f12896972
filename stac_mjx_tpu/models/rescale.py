"""Uniform spec rescaling (host-side, MjSpec).

Behavioral equivalent of the reference's `dm_scale_spec`
(stac_mjx/rescale.py:6-46): scales body positions, geom fromto/size/pos, mesh
scales, actuator gear by scale^2 (muscle cross-section), and keyframe qpos z.
Operates on a copy; the input spec is untouched.
"""

from __future__ import annotations


def scale_spec(spec, scale: float):
    """Return a uniformly scaled copy of an MjSpec."""
    scaled = spec.copy()

    def _scale_subtree(parent) -> None:
        body = parent.first_body()
        while body:
            if body.pos is not None:
                body.pos = body.pos * scale
            for geom in body.geoms:
                geom.fromto = geom.fromto * scale
                geom.size = geom.size * scale
                if geom.pos is not None:
                    geom.pos = geom.pos * scale
            _scale_subtree(body)
            body = parent.next_body(body)

    for mesh in scaled.meshes:
        mesh.scale = mesh.scale * scale

    for actuator in scaled.actuators:
        actuator.gear = actuator.gear * scale * scale

    for key in scaled.keys:
        qpos = key.qpos
        qpos[2] = qpos[2] * scale
        key.qpos = qpos

    # Parity quirk (stac_mjx/rescale.py:45): the reference recurses from
    # worldbody.first_body(), so the first top-level body's own pos/geoms and
    # any sibling top-level bodies are NOT scaled. Reproduced intentionally.
    first = scaled.worldbody.first_body()
    if first is not None:
        _scale_subtree(first)
    return scaled
