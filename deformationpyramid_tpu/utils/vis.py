"""Point-cloud visualization helpers.

Replaces the reference's mayavi/open3d viewers (``utils/vis.py:11-47``) with
headless-friendly outputs: matplotlib 3D scatter saved to PNG, and PLY
export for external viewers. Same call shape as the reference's
``visualize_pcds(src_pcd=..., tgt_pcd=..., warped_pcd=...)``.
"""
from __future__ import annotations

import numpy as np

_COLORS = {
    "src_pcd": "#2563eb",      # blue
    "tgt_pcd": "#dc2626",      # red
    "warped_pcd": "#16a34a",   # green
    "ldmk_s": "#f59e0b",
    "ldmk_t": "#9333ea",
}


def visualize_pcds(save_path: str | None = None, max_points: int = 5000,
                   **clouds) -> str | None:
    """Render named clouds ([N,3] arrays) to a PNG; returns the path."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig = plt.figure(figsize=(8, 8))
    ax = fig.add_subplot(111, projection="3d")
    rng = np.random.default_rng(0)
    for name, pts in clouds.items():
        if pts is None:
            continue
        pts = np.asarray(pts)
        if len(pts) > max_points:
            pts = pts[rng.permutation(len(pts))[:max_points]]
        ax.scatter(pts[:, 0], pts[:, 1], pts[:, 2], s=0.5,
                   c=_COLORS.get(name, None), label=name, alpha=0.6)
    ax.legend()
    ax.set_box_aspect((1, 1, 1))
    path = save_path or "pcds.png"
    fig.savefig(path, dpi=120, bbox_inches="tight")
    plt.close(fig)
    return path


def export_pcds_ply(path: str, **clouds) -> None:
    """Dump all clouds into one colored ascii PLY for external viewers."""
    palette = {"src_pcd": (60, 100, 235), "tgt_pcd": (220, 40, 40),
               "warped_pcd": (25, 165, 80)}
    rows = []
    for name, pts in clouds.items():
        if pts is None:
            continue
        r, g, b = palette.get(name, (200, 200, 200))
        for p in np.asarray(pts):
            rows.append(f"{p[0]:.5f} {p[1]:.5f} {p[2]:.5f} {r} {g} {b}")
    with open(path, "w") as f:
        f.write("ply\nformat ascii 1.0\n")
        f.write(f"element vertex {len(rows)}\n")
        f.write("property float x\nproperty float y\nproperty float z\n")
        f.write("property uchar red\nproperty uchar green\nproperty uchar blue\n")
        f.write("end_header\n")
        f.write("\n".join(rows) + "\n")
