"""Gradient accumulation bookkeeping (ref embedding_dataset.py:198-273).

On a v5e-8 slice the reference's effective 8192 batch fits without
accumulation (SURVEY.md §2.13), but GradAccum is kept for parity and for
memory-constrained configs: it computes meta-batch bookkeeping and the exact
loss scaling such that accumulated gradients equal large-batch gradients,
including the rescale of a trailing incomplete meta-batch.
"""

from __future__ import annotations

from typing import Iterable

from novic_tpu.data.config import LoaderInfo
from novic_tpu.utils.logger import log


class GradAccum:

    def __init__(self, loader, loader_info: LoaderInfo, accum_size: int, drop_last: bool):
        self.raw_loader = loader
        self.raw_loader_info = loader_info
        self.accum_size = accum_size
        self.drop_last = drop_last

        if self.accum_size < 1:
            raise ValueError(f"Accumulation size below 1: {self.accum_size}")
        assert loader_info.epoch_batches == len(loader)

        self.batch_size = loader_info.batch_size
        self.accum_batch_size = self.batch_size * self.accum_size
        self.complete_steps = loader_info.complete_batches // self.accum_size
        self.complete_batches = self.complete_steps * self.accum_size
        self.complete_samples = self.complete_batches * self.batch_size

        if self.drop_last:
            self.loader_batches = self.complete_batches
            self.loader_samples = self.complete_samples
            self.incomplete_batches = 0
            self.incomplete_samples = 0
            self.incomplete_step = False
        else:
            self.loader_batches = loader_info.epoch_batches
            self.loader_samples = loader_info.epoch_samples
            self.incomplete_batches = self.loader_batches - self.complete_batches
            self.incomplete_samples = self.loader_samples - self.complete_samples
            assert self.incomplete_batches >= 0 and self.incomplete_samples >= 0
            assert (self.incomplete_batches > 0) == (self.incomplete_samples > 0)
            self.incomplete_step = self.incomplete_samples > 0

        self.loader_steps = self.complete_steps + self.incomplete_step
        self.batch_num = 0

        log.info(
            f"Gradient accumulation factor {self.accum_size} results in {self.complete_steps}"
            f"+{int(self.incomplete_step)} = {self.loader_steps} meta-batches of size "
            f"{self.accum_batch_size}+{self.incomplete_samples}")

    def loader(self) -> Iterable:
        """Re-iterable epoch loader. MUST survive multiple `for` passes: the
        training loop iterates it once per epoch, and a one-shot iterator here
        (a bare islice was the round-2 soak hang: epoch 2 yielded zero batches
        and the loop spun forever) silently ends training at the first epoch
        whose batch count isn't an accumulation multiple."""
        self.batch_num = 0
        ga = self

        class _EpochLoader:
            def __iter__(self):
                ga.batch_num = 0
                if ga.drop_last and ga.loader_batches < ga.raw_loader_info.epoch_batches:
                    import itertools

                    return iter(itertools.islice(ga.raw_loader, ga.loader_batches))
                return iter(ga.raw_loader)

            def __len__(self):
                return ga.loader_batches

        return _EpochLoader()

    def accum_loss(self, mean_batch_loss, num_in_batch: int):
        """Scale the mean batch loss for accumulation; returns (scaled_loss, do_optimizer_step)."""
        self.batch_num += 1
        if self.batch_num <= self.complete_batches:
            scaled = mean_batch_loss / self.accum_size
        else:
            scaled = mean_batch_loss * (num_in_batch / self.incomplete_samples)
        optimizer_step = (self.batch_num % self.accum_size == 0
                          or self.batch_num == self.raw_loader_info.epoch_batches)
        return scaled, optimizer_step
