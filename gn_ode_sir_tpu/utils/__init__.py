"""Cross-cutting utilities: config, label cache, CSV metrics sink, timing."""

from gn_ode_sir_tpu.utils.config import ExperimentConfig
from gn_ode_sir_tpu.utils.labels import label_paths, load_labels, load_or_extract_labels, load_or_extract_labels_many
from gn_ode_sir_tpu.utils.csvsink import csv_trials, save_trial_to_csv
from gn_ode_sir_tpu.utils.timing import Timer
from gn_ode_sir_tpu.utils.profiling import MetricsLogger, device_memory_stats, trace

__all__ = [
    "MetricsLogger",
    "device_memory_stats",
    "trace",
    "ExperimentConfig",
    "label_paths",
    "load_labels",
    "load_or_extract_labels",
    "load_or_extract_labels_many",
    "csv_trials",
    "save_trial_to_csv",
    "Timer",
]
