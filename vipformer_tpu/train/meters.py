"""Running meters (reference `utils.py:54-91`)."""

from __future__ import annotations


class AverageMeter:
    def __init__(self):
        self.reset()

    def reset(self):
        self.val = 0.0
        self.avg = 0.0
        self.sum = 0.0
        self.count = 0

    def update(self, val: float, n: int = 1):
        self.val = float(val)
        self.sum += float(val) * n
        self.count += n
        self.avg = self.sum / max(self.count, 1)


class AccuracyMeter:
    def __init__(self):
        self.reset()

    def reset(self):
        self.num_pos = 0
        self.num_neg = 0
        self.total = 0

    def update(self, num_pos: int, num_neg: int, n: int = 1):
        self.num_pos += int(num_pos)
        self.num_neg += int(num_neg)
        self.total += int(n)

    @property
    def accuracy(self) -> float:
        return self.num_pos / max(self.total, 1)
