"""Single-file tail-append bridge (SURVEY.md §7.3 deviation, closed).

The reference's streaming source tails ONE growing file byte-wise
(src/Streaming/worker.py:503-511: seek to saved offset, read new bytes,
ship complete lines). Spark's file stream source tracks new FILES, not
appended bytes — the documented substitute is a directory micro-files
land in. This module closes the gap for genuinely append-only single
files (a live server log): a tailer follows the file and rolls each
batch of newly-appended COMPLETE lines into an atomic micro-file in a
spool directory, which `StreamJob` (streaming/job.py) then consumes —
so the reference's exact operating shape (tail -f one file, forever)
runs end-to-end on Structured Streaming.

Exactly-once handoff:
- only whole lines ship; a partial line after the last newline stays in
  the source file until its newline arrives (the reference holds
  partial reads the same way);
- each micro-file is named by the BYTE OFFSET its content starts at and
  written atomically (tmp + rename), so its name and content are a pure
  function of the source file — a crash-and-repoll rewrites the
  identical file, which the file source has either already consumed (by
  name) or will consume once;
- the resume offset is persisted to ``<spool>/_tail_offset`` AFTER the
  rename; combined with the deterministic names, every crash window
  replays idempotently (same guarantee the reference gets from its
  processed-log, worker.py:81-186).

At scale one tailer is one lightweight driver-side (or edge-side)
process per log file — the Spark cluster only ever sees the spool
directory; fan-in of thousands of files is just thousands of spools
sharing one glob.
"""

from __future__ import annotations

import os


class FileTailer:
    """Roll appended bytes of ``src_path`` into micro-files under
    ``spool_dir``. Call :meth:`poll_once` on a timer (or :meth:`run`)."""

    def __init__(self, src_path: str, spool_dir: str):
        self.src_path = src_path
        self.spool_dir = spool_dir
        os.makedirs(spool_dir, exist_ok=True)
        self._offset_path = os.path.join(spool_dir, "_tail_offset")
        self.epoch, self.offset = self._load_state()

    def _load_state(self) -> tuple[int, int]:
        try:
            with open(self._offset_path) as f:
                epoch, offset = f.read().strip().split(":")
                return int(epoch), int(offset)
        except (FileNotFoundError, ValueError):
            return 0, 0

    def _save_state(self) -> None:
        tmp = self._offset_path + ".tmp"
        with open(tmp, "w") as f:
            f.write(f"{self.epoch}:{self.offset}")
        os.replace(tmp, self._offset_path)

    def poll_once(self) -> int:
        """Ship newly-appended complete lines; return bytes shipped.

        Truncation (offset beyond EOF — log rotation copied the file
        away) restarts at offset 0 under a NEW rotation epoch, matching
        ``tail -F``; the epoch is part of every micro-file name, so
        post-rotation content never reuses a name the file source has
        already consumed."""
        try:
            size = os.path.getsize(self.src_path)
        except FileNotFoundError:
            return 0
        if size < self.offset:  # rotated/truncated
            self.epoch += 1
            self.offset = 0
            self._save_state()
        if size == self.offset:
            return 0
        with open(self.src_path, "rb") as f:
            f.seek(self.offset)
            chunk = f.read(size - self.offset)
        # hold back the partial line after the last newline
        cut = chunk.rfind(b"\n")
        if cut < 0:
            return 0
        complete = chunk[: cut + 1]
        name = os.path.join(
            self.spool_dir, f"part-{self.epoch:04d}-{self.offset:016d}.txt"
        )
        tmp = name + ".tmp"
        with open(tmp, "wb") as f:
            f.write(complete)
        os.replace(tmp, name)  # atomic: the file source sees whole files
        self.offset += len(complete)
        self._save_state()
        return len(complete)

    def run(self, poll_interval: float = 0.5, stop=None) -> None:
        """Tail forever (until ``stop`` — a threading.Event — is set)."""
        import time

        while stop is None or not stop.is_set():
            self.poll_once()
            time.sleep(poll_interval)
