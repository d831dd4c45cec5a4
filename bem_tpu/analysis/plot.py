"""Model-comparison scatter plots (reference: analysis/plot.py)."""

from __future__ import annotations

from typing import Dict, Sequence


def psnr_vs_flops_scatter(models: Sequence[Dict], out_path: str = "psnr_flops.png",
                          xkey: str = "flops", ykey: str = "psnr",
                          label_key: str = "name"):
    """models: [{'name', 'flops' (G), 'psnr' (dB), 'params' (M, optional)}].

    Marker area scales with params when present (the reference's bubble plot).
    """
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(7, 5))
    for m in models:
        size = 40 + 20 * m.get("params", 1.0)
        ax.scatter(m[xkey], m[ykey], s=size, alpha=0.7)
        ax.annotate(m[label_key], (m[xkey], m[ykey]),
                    textcoords="offset points", xytext=(6, 4), fontsize=9)
    ax.set_xlabel("FLOPs (G)")
    ax.set_ylabel("PSNR (dB)")
    ax.grid(alpha=0.3)
    fig.tight_layout()
    fig.savefig(out_path, dpi=150)
    plt.close(fig)
    return out_path
