from vislam_tpu.viz.plots import plot_trajectory, plot_state_comparison, draw_matches
from vislam_tpu.viz.live import LiveViz

__all__ = ["plot_trajectory", "plot_state_comparison", "draw_matches", "LiveViz"]
