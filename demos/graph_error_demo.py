"""Registration-quality analysis: per-frame marker error graphs.

Equivalent of the reference's graph_error.ipynb: load a STAC output file,
recompute the per-frame summed squared marker error by forward kinematics
with the fitted offsets, then report/plot

- error-vs-frame scatter and a log-scale error histogram,
- the frames whose error exceeds a threshold ("not good offset frames"),
- the per-frame qpos change, split into clip-boundary frames vs mid-clip
  frames (the notebook's clip-seam diagnostic).

Where the notebook loops frames around a jitted vmap resid, here the whole
residual recomputation is one ``jit(vmap(...))`` over all frames.

    python demos/graph_error_demo.py <output.h5> [--threshold 0.005]
                                     [--clip-len 360] [--save-prefix errors]
"""

import argparse
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]


def recompute_errors(data_path, base_path=REPO):
    """(per-frame summed squared marker error recomputed by FK, StacData)."""
    import jax
    import jax.numpy as jnp

    from stac_mjx_tpu import io
    from stac_mjx_tpu.stac import Stac
    from stac_mjx_tpu.utils.assets import resolve_asset

    cfg, d = io.load_stac_data(data_path)
    xml = resolve_asset(cfg.model.MJCF_PATH, base_path)
    stac = Stac(xml, cfg, d.kp_names)

    core = stac.stac_core_obj
    params = stac.params.set_site_pos(
        jnp.asarray(d.offsets.reshape(-1, 3)), jnp.asarray(core.site_idxs)
    )

    def resid(qpos, kps):
        markers = core.fk(params, qpos).site_xpos[core.site_idxs].flatten()
        return jnp.sum(jnp.square(kps - markers))

    qposes = jnp.asarray(d.qpos, jnp.float32)
    kps = jnp.asarray(d.kp_data[: d.qpos.shape[0]], jnp.float32)
    return np.asarray(jax.jit(jax.vmap(resid))(qposes, kps)), d


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("data_path", help="STAC fit/ik output .h5")
    ap.add_argument("--threshold", type=float, default=0.005)
    ap.add_argument("--clip-len", type=int, default=360)
    ap.add_argument("--save-prefix", default="graph_error")
    ap.add_argument("--no-plots", action="store_true")
    args = ap.parse_args()

    errors, d = recompute_errors(args.data_path)
    n = errors.shape[0]
    print(f"mean: {errors.mean()}, std: {errors.std()}")
    bad = np.where(errors > args.threshold)[0]
    print(f"there are {bad.shape[0]} not good offset frames (>{args.threshold})")

    qpos_diff_summed = np.abs(np.diff(d.qpos, axis=0)).sum(axis=1)
    seam = np.array([(i + 1) % args.clip_len <= 5 for i in range(n - 1)])
    if seam.any() and (~seam).any():
        print(
            f"qpos change at clip seams: {qpos_diff_summed[seam].mean():.4f} "
            f"vs mid-clip: {qpos_diff_summed[~seam].mean():.4f}"
        )

    if not args.no_plots:
        import matplotlib

        matplotlib.use("Agg")
        from matplotlib import pyplot as plt

        fig, axes = plt.subplots(1, 3, figsize=(15, 4))
        axes[0].scatter(np.arange(n), errors, s=1)
        axes[0].set(
            title="Summed squared error of frame marker offset",
            xlabel="Frame #",
            ylabel="Summed squared error",
            ylim=(0, max(0.02, float(np.percentile(errors, 99)) * 1.5)),
        )
        axes[1].hist(errors, bins=100, log=True)
        axes[1].set(
            title="Histogram of errors", xlabel="error value", ylabel="frames"
        )
        axes[2].hist(
            qpos_diff_summed[seam], bins=100, log=True, alpha=0.5, label="seam"
        )
        axes[2].hist(
            qpos_diff_summed[~seam], bins=100, log=True, alpha=0.5, label="mid"
        )
        axes[2].set(
            title="qpos change: clip seams vs mid", xlabel="sum |dqpos|"
        )
        axes[2].legend()
        out = Path(f"{args.save_prefix}.png")
        fig.tight_layout()
        fig.savefig(out, dpi=120)
        print(f"plots: {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
