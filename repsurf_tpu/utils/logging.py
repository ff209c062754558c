"""Logging / metering / profiling utilities.

Mirrors the reference's observability surface (SURVEY.md §5): Python logging
to file+stdout (segmentation/util/utils.py:108-122), AverageMeter
(util/utils.py:25-41), and adds what the reference lacks — step timing and
jax.profiler trace hooks for TPU performance work.
"""

import contextlib
import logging
import os
import sys
import time


def get_logger(log_dir, name="repsurf_tpu"):
    """File + stdout logger (the reference's get_logger shape)."""
    os.makedirs(log_dir, exist_ok=True)
    logger = logging.getLogger(name)
    logger.setLevel(logging.INFO)
    logger.handlers = []
    fmt = logging.Formatter(
        "[%(asctime)s %(levelname)s %(filename)s:%(lineno)d] %(message)s"
    )
    fh = logging.FileHandler(os.path.join(log_dir, f"{name}.txt"))
    fh.setFormatter(fmt)
    sh = logging.StreamHandler(sys.stdout)
    sh.setFormatter(fmt)
    logger.addHandler(fh)
    logger.addHandler(sh)
    return logger


class AverageMeter:
    """Running value/avg/sum/count meter."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.val = 0
        self.avg = 0
        self.sum = 0
        self.count = 0

    def update(self, val, n=1):
        self.val = val
        self.sum += val * n
        self.count += n
        self.avg = self.sum / self.count


class StepTimer:
    """Batch/data wall-clock timing + remaining-time ETA (the reference's
    inline meters, segmentation/tool/train.py:262-267,309-318)."""

    def __init__(self):
        self.batch = AverageMeter()
        self.data = AverageMeter()
        self._end = time.time()

    def data_loaded(self):
        self.data.update(time.time() - self._end)

    def step_done(self):
        self.batch.update(time.time() - self._end)
        self._end = time.time()

    def eta(self, remaining_steps):
        secs = int(remaining_steps * self.batch.avg)
        m, s = divmod(secs, 60)
        h, m = divmod(m, 60)
        return f"{h:02d}:{m:02d}:{s:02d}"


@contextlib.contextmanager
def profile_trace(log_dir, enabled=True):
    """jax.profiler trace context — new capability vs the reference (which
    has no profiling subsystem, SURVEY.md §5).  View with TensorBoard or
    xprof."""
    if not enabled:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class ScalarWriter:
    """Minimal scalar logger writing JSONL (tensorboardX replacement with no
    extra dependency; readable by any plotting tool)."""

    def __init__(self, log_dir):
        os.makedirs(log_dir, exist_ok=True)
        self._f = open(os.path.join(log_dir, "scalars.jsonl"), "a")

    def add_scalar(self, tag, value, step):
        import json

        self._f.write(json.dumps({"tag": tag, "value": float(value), "step": int(step)}) + "\n")
        self._f.flush()

    def close(self):
        self._f.close()
