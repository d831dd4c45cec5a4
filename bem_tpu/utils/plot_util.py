"""Plotting/log-parsing helpers (reference: basicsr/utils/plot_util.py)."""

from __future__ import annotations

import re


def read_data_from_tensorboard(log_path, tag):
    """Get raw data (steps, values) from tensorboard event files."""
    from tensorboardX.event_file_loader import EventFileLoader  # type: ignore

    steps, values = [], []
    try:
        from tensorboard.backend.event_processing.event_accumulator import (
            EventAccumulator,
        )

        ea = EventAccumulator(log_path)
        ea.Reload()
        for e in ea.Scalars(tag):
            steps.append(e.step)
            values.append(e.value)
    except ImportError:
        raise ImportError("tensorboard needed to parse event files")
    return steps, values


def read_data_from_txt_2v(path, pattern, step_one=False):
    """Parse (step, value) pairs from a log file by regex with 2 groups."""
    steps, values = [], []
    pat = re.compile(pattern)
    with open(path) as f:
        for line in f:
            m = pat.search(line)
            if m:
                steps.append(int(m.group(1).replace(",", "")))
                values.append(float(m.group(2)))
    if step_one:
        steps = list(range(1, len(values) + 1))
    return steps, values


def read_data_from_txt_1v(path, pattern):
    """Parse values from a log file by regex with 1 group."""
    values = []
    pat = re.compile(pattern)
    with open(path) as f:
        for line in f:
            m = pat.search(line)
            if m:
                values.append(float(m.group(1)))
    return values


def smooth_data(values, smooth_weight):
    """Exponential moving-average smoothing (tensorboard-style)."""
    out = []
    last = values[0]
    for v in values:
        last = last * smooth_weight + (1 - smooth_weight) * v
        out.append(last)
    return out
