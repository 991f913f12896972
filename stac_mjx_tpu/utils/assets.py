"""Asset path resolution.

Model MJCFs and demo mocap data are data assets, not code. This resolver
looks for them, in order, under:

1. ``$STAC_TPU_ASSET_PATH`` (explicit override),
2. the repo's own ``models`` / data directories (first-party assets),
3. the read-only reference checkout (``/root/reference``) when present —
   the reference's models/ and tests/data/ trees are used as-is for parity
   workloads rather than duplicated into this repo.
"""

from __future__ import annotations

import os
from pathlib import Path

_REPO_ROOT = Path(__file__).resolve().parents[2]
_REFERENCE_ROOT = Path("/root/reference")


def asset_roots() -> list[Path]:
    """Candidate roots for resolving relative asset paths."""
    roots = []
    env = os.environ.get("STAC_TPU_ASSET_PATH")
    if env:
        roots.extend(Path(p) for p in env.split(":"))
    roots.append(_REPO_ROOT)
    if _REFERENCE_ROOT.exists():
        roots.append(_REFERENCE_ROOT)
    return roots


def resolve_asset(rel_path: str | Path, base_path: Path | None = None) -> Path:
    """Resolve a relative asset path against the known roots.

    An absolute existing path is returned unchanged; ``base_path`` (the CLI
    --base-path) is tried first to match the reference's path semantics.
    """
    p = Path(rel_path)
    if p.is_absolute():
        return p
    candidates = []
    if base_path is not None:
        candidates.append(Path(base_path) / p)
    candidates.extend(root / p for root in asset_roots())
    for c in candidates:
        if c.exists():
            return c
    return candidates[0] if candidates else p
