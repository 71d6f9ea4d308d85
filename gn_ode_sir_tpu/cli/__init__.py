"""CLI layer: experiment worker + monitorer experiment-matrix driver."""
