"""``python -m multi_modal_gnn_tpu`` — delegates to the pipeline runner CLI.

Equivalent to ``python run_pipeline.py`` from the repo root; works from any
cwd once the package is importable.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from run_pipeline import main  # noqa: E402

if __name__ == "__main__":
    sys.exit(main())
