"""Console metric logging (replaces reference utils/misc.py:33-252
MetricLogger/SmoothedValue; the NCCL helpers it also carried are superseded
by jax collectives in parallel/)."""

from __future__ import annotations

import datetime
import time
from collections import defaultdict, deque


class SmoothedValue:
    """Track a series with a moving window and global average."""

    def __init__(self, window_size: int = 20, fmt: str = "{median:.4f} ({global_avg:.4f})"):
        self.deque = deque(maxlen=window_size)
        self.total = 0.0
        self.count = 0
        self.fmt = fmt

    def update(self, value, n: int = 1):
        self.deque.append(float(value))
        self.count += n
        self.total += float(value) * n

    def synchronize_between_processes(self):
        """Sum (count, total) across jax processes (the reference's NCCL
        all_reduce of the same pair, reference utils/misc.py:50-62). The
        window deque stays local, exactly like the reference. No-op at
        process_count == 1."""
        ct = _all_reduce_sum([float(self.count), self.total])
        if ct is not None:
            self.count, self.total = int(ct[0]), float(ct[1])

    @property
    def median(self):
        d = sorted(self.deque)
        return d[len(d) // 2] if d else 0.0

    @property
    def avg(self):
        return sum(self.deque) / len(self.deque) if self.deque else 0.0

    @property
    def global_avg(self):
        return self.total / max(self.count, 1)

    @property
    def value(self):
        return self.deque[-1] if self.deque else 0.0

    def __str__(self):
        return self.fmt.format(median=self.median, avg=self.avg,
                               global_avg=self.global_avg, value=self.value)


def _all_reduce_sum(values):
    """Sum a small list of floats across jax processes; None when single
    process (callers skip the update). Uses the multi-host allgather helper
    over DCN — the TPU-native replacement for the reference's pickled NCCL
    all_gather (reference utils/misc.py:95-135)."""
    import jax

    if jax.process_count() == 1:
        return None
    import numpy as np
    from jax.experimental import multihost_utils

    gathered = multihost_utils.process_allgather(
        np.asarray(values, np.float64))
    return np.asarray(gathered).sum(axis=0)


def reduce_dict(d: dict, average: bool = True) -> dict:
    """Reduce a dict of scalars across processes (reference
    utils/misc.py:138-162). Keys must match on every process."""
    import jax

    if jax.process_count() == 1:
        return dict(d)
    keys = sorted(d)
    summed = _all_reduce_sum([float(d[k]) for k in keys])
    if average:
        summed = summed / jax.process_count()
    return dict(zip(keys, summed.tolist()))


class MetricLogger:
    def __init__(self, delimiter: str = "  ", log=print):
        self.meters = defaultdict(SmoothedValue)
        self.delimiter = delimiter
        self.log = log

    def update(self, **kwargs):
        for k, v in kwargs.items():
            self.meters[k].update(float(v))

    def __getattr__(self, attr):
        if attr in self.meters:
            return self.meters[attr]
        raise AttributeError(attr)

    def synchronize_between_processes(self):
        """reference utils/misc.py:176-178."""
        for meter in self.meters.values():
            meter.synchronize_between_processes()

    def __str__(self):
        return self.delimiter.join(
            f"{name}: {meter}" for name, meter in self.meters.items())

    def log_every(self, iterable, print_freq: int, header: str = ""):
        start = time.time()
        iter_time = SmoothedValue(fmt="{avg:.4f}")
        total = len(iterable) if hasattr(iterable, "__len__") else None
        end = time.time()
        for i, obj in enumerate(iterable):
            yield obj
            iter_time.update(time.time() - end)
            if i % print_freq == 0 or (total and i == total - 1):
                if total:
                    eta = datetime.timedelta(
                        seconds=int(iter_time.global_avg * (total - i - 1)))
                    self.log(f"{header} [{i}/{total}] eta: {eta} "
                             f"{self} time: {iter_time}")
                else:
                    self.log(f"{header} [{i}] {self} time: {iter_time}")
            end = time.time()
        elapsed = datetime.timedelta(seconds=int(time.time() - start))
        self.log(f"{header} Total time: {elapsed}")


def setup_wandb(keys_folder: str = "wandb_keys") -> bool:
    """Interactive wandb API-key bootstrap (reference utils/misc.py:
    388-403): cache the key per user under ``wandb_keys/<user>_wandb.key``,
    prompting once on a TTY. Returns True when a key is available (already
    in the environment, cached, or just entered); False otherwise — the
    caller falls back to the no-op logger. Unlike the reference (which
    ``os.system("export ...")``s into a throwaway subshell), the key is
    placed in THIS process's environment where wandb.init reads it."""
    import getpass
    import os
    import sys

    if os.environ.get("WANDB_API_KEY"):
        return True
    netrc = os.path.expanduser("~/.netrc")
    try:  # an existing `wandb login` session also counts
        if os.path.exists(netrc) and "api.wandb.ai" in open(netrc).read():
            return True
    except OSError:
        pass
    user = getpass.getuser()
    key_path = os.path.join(keys_folder, f"{user}_wandb.key")
    if os.path.exists(key_path):
        with open(key_path) as f:
            key = f.read().strip()
    elif sys.stdin.isatty():
        key = input("[You need to firstly setup and login wandb] Please "
                    "enter your wandb key (https://wandb.ai/authorize):"
                    ).strip()
        if not key:
            return False
        os.makedirs(keys_folder, exist_ok=True)
        with open(key_path, "w") as f:
            f.write(key)
    else:
        return False
    os.environ["WANDB_API_KEY"] = key
    return True
