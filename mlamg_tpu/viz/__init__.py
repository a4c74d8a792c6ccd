from mlamg_tpu.viz.aggplot import (  # noqa: F401
    plot_grid,
    plot_agg,
    plot_spider_agg,
    plot_agg_3d,
    AsyncPlotter,
)
