"""Visualization smoke tests (render to files, no display)."""

import os

import numpy as np
import jax.numpy as jnp

from mlamg_tpu.data import Grid
from mlamg_tpu.viz import plot_grid, plot_agg, plot_spider_agg, plot_agg_3d, AsyncPlotter


def test_plot_functions_render(tmp_path):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    g = Grid.structured_2d_poisson_dirichlet(6, 6)
    agg = np.arange(g.n) % 4

    for name, fn in [
        ("grid", lambda ax: plot_grid(g, ax)),
        ("agg", lambda ax: plot_agg(g, agg, ax)),
        ("spider", lambda ax: plot_spider_agg(g, agg, None, ax)),
    ]:
        fig, ax = plt.subplots()
        fn(ax)
        out = os.path.join(tmp_path, f"{name}.png")
        fig.savefig(out)
        plt.close(fig)
        assert os.path.getsize(out) > 1000

    g3 = Grid.structured_3d_laplace_dirichlet(4, 4, 4)
    fig = plt.figure()
    plot_agg_3d(g3, np.arange(g3.n) % 5)
    out = os.path.join(tmp_path, "agg3d.png")
    fig.savefig(out)
    plt.close(fig)
    assert os.path.getsize(out) > 1000


def test_async_plotter(tmp_path):
    g = Grid.structured_2d_poisson_dirichlet(5, 5)
    agg = np.arange(g.n) % 3
    out = os.path.join(tmp_path, "async_agg.png")
    with AsyncPlotter() as ap:
        ap.plot("agg", g, agg, out_path=out)
    assert os.path.exists(out) and os.path.getsize(out) > 1000
