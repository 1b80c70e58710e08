"""Append-to-file logger and running-average meters.

Reference parity: ``utils/utils.py:2-33`` (Logger, AverageMeter).
"""
from __future__ import annotations

import os


class AverageMeter:
    def __init__(self):
        self.reset()

    def reset(self):
        self.val = 0.0
        self.avg = 0.0
        self.sum = 0.0
        self.count = 0
        self.sq_sum = 0.0

    def update(self, val: float, n: int = 1):
        self.val = float(val)
        self.sum += float(val) * n
        self.count += n
        self.avg = self.sum / self.count
        self.sq_sum += float(val) ** 2 * n

    @property
    def std(self) -> float:
        if self.count == 0:
            return 0.0
        var = self.sq_sum / self.count - self.avg ** 2
        return max(var, 0.0) ** 0.5


class Logger:
    def __init__(self, path: str):
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        self.path = path
        self.fw = open(path, "a")

    def write(self, text: str):
        self.fw.write(text)
        self.fw.flush()

    def close(self):
        self.fw.close()
