"""Preemption-aware training: checkpoint-and-requeue on signals.

The reference trains under SLURM with an elastic-requeue handler:
SIGUSR1 triggers ``scontrol requeue $SLURM_JOB_ID`` and SIGTERM is
swallowed so the requeue wins the race (reference:
contriever/src/slurm.py:18-40, ``#SBATCH --requeue``). TPU pools preempt
with SIGTERM; the analog here is scheduler-agnostic:

  * ``PreemptionGuard`` latches SIGTERM/SIGUSR1 into a flag the train
    loop polls between steps;
  * on a latched signal the loop saves a checkpoint and (optionally)
    execs a requeue command (``scontrol requeue``, ``gcloud … resume``,
    or anything else) before exiting;
  * restart resumes from the orbax-style checkpoint as usual
    (``trainer.latest_checkpoint_step``).
"""

from __future__ import annotations

import logging
import os
import signal
import subprocess
import threading

logger = logging.getLogger(__name__)


class PreemptionGuard:
    def __init__(self, signals=(signal.SIGTERM, signal.SIGUSR1)):
        self._event = threading.Event()
        self._previous = {}
        self.signals = signals

    # ------------------------------------------------------------ install
    def install(self) -> "PreemptionGuard":
        for sig in self.signals:
            self._previous[sig] = signal.signal(sig, self._handler)
        return self

    def uninstall(self) -> None:
        for sig, prev in self._previous.items():
            signal.signal(sig, prev)
        self._previous.clear()

    def __enter__(self):
        return self.install()

    def __exit__(self, *exc):
        self.uninstall()
        return False

    def _handler(self, signum, frame):
        logger.warning("received signal %d: checkpointing at next step", signum)
        self._event.set()

    # ------------------------------------------------------------ query
    @property
    def preempted(self) -> bool:
        return self._event.is_set()

    def trigger(self) -> None:  # tests / manual drains
        self._event.set()


def requeue(command: str | None = None) -> None:
    """Re-submit this job. Default: SLURM requeue when under SLURM
    (the reference's ``scontrol requeue``); otherwise a no-op with a log
    line — pass an explicit command for other schedulers."""
    if command is None:
        job_id = os.environ.get("SLURM_JOB_ID")
        if not job_id:
            logger.info("no requeue command and not under SLURM; exiting")
            return
        command = f"scontrol requeue {job_id}"
    logger.warning("requeueing: %s", command)
    try:
        subprocess.run(command, shell=True, check=True, timeout=60)
    except subprocess.SubprocessError as e:
        logger.error("requeue failed: %s", e)
