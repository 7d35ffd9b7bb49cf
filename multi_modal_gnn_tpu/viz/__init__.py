"""Visualization: training curves, graph structure, advanced analyses.

Capability-parity with the reference's three viz modules (src/visualize.py,
src/visualize_graph.py, src/advanced_visualizations.py), rendered headless
(Agg backend).  umap is optional and not present in this image, so embedding
projections fall back to PCA / t-SNE (sklearn).
"""

import matplotlib

matplotlib.use("Agg")

from multi_modal_gnn_tpu.viz.training_viz import create_all_visualizations  # noqa: F401,E402
from multi_modal_gnn_tpu.viz.graph_viz import visualize_graph_structure  # noqa: F401,E402
from multi_modal_gnn_tpu.viz.advanced import run_advanced_visualizations  # noqa: F401,E402
from multi_modal_gnn_tpu.viz.uncertainty import run_uncertainty_visualizations  # noqa: F401,E402
