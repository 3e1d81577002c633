"""TensorBoard scalar logging (reference: tensorboardX SummaryWriter into a
timestamped tb_dir, utils/train.py:166-172; here actually used rather than
commented out). Degrades to a no-op when tensorboardX is missing."""

from typing import Optional


class TBWriter:
    def __init__(self, logdir: Optional[str], rank: int = 0):
        self._w = None
        if logdir and rank == 0:
            try:
                from tensorboardX import SummaryWriter

                self._w = SummaryWriter(logdir)
            except Exception:
                self._w = None

    def scalar(self, tag: str, value, step: int):
        if self._w is not None:
            self._w.add_scalar(tag, float(value), int(step))

    def close(self):
        if self._w is not None:
            self._w.close()
