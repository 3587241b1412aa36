"""Plot helpers (reference ``audiossl/utils/plot.py`` +
``methods/atstframe/plot_attention.py``). matplotlib is optional."""
from __future__ import annotations

import numpy as np


def plot_spec(spec, path: str, title: str = ""):
    """Save a spectrogram heatmap [F, T] to `path`."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(10, 4))
    ax.imshow(np.asarray(spec), origin="lower", aspect="auto",
              interpolation="nearest")
    ax.set_xlabel("frames")
    ax.set_ylabel("mel bins")
    if title:
        ax.set_title(title)
    fig.tight_layout()
    fig.savefig(path, dpi=120)
    plt.close(fig)


def plot_attention(encoder, params, mel, length=None, path: str = None):
    """Dump last-block attention maps per head (DINO-style, reference
    visualize_attention.py). Returns the [B, H, N, N] maps; saves a
    grid image when `path` is given."""
    import jax

    attn = encoder.apply({"params": params}, mel, length,
                         method=encoder.get_last_selfattention)
    attn = np.asarray(attn)
    if path is not None:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        H = attn.shape[1]
        fig, axes = plt.subplots(1, H, figsize=(3 * H, 3))
        for h in range(H):
            axes[h].imshow(attn[0, h], aspect="auto")
            axes[h].set_title(f"head {h}")
        fig.tight_layout()
        fig.savefig(path, dpi=120)
        plt.close(fig)
    return attn
