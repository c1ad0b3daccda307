from vislam_tpu.viz.plots import plot_trajectory, plot_state_comparison, draw_matches

__all__ = ["plot_trajectory", "plot_state_comparison", "draw_matches"]
