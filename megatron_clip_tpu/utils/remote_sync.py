"""Background checkpoint sync.

open_CLIP's --remote-sync starts a child process copying the checkpoint dir
to a remote (s3/fsspec) destination every N seconds (main.py:176-196,
training/file_utils.py). TPU pods usually mount GCS via fuse or use Orbax's
native GCS paths, so the equivalent here is a background thread mirroring
the local checkpoint root to any mounted destination path.
"""
import os
import shutil
import threading
import time


def _sync_dir(src: str, dst: str) -> int:
    """Copy new/changed files src -> dst (size+mtime heuristic). Returns the
    number of files copied."""
    copied = 0
    for root, _, files in os.walk(src):
        rel = os.path.relpath(root, src)
        troot = os.path.join(dst, rel) if rel != "." else dst
        os.makedirs(troot, exist_ok=True)
        for fn in files:
            s = os.path.join(root, fn)
            t = os.path.join(troot, fn)
            try:
                st = os.stat(s)
                if (not os.path.exists(t)
                        or os.stat(t).st_size != st.st_size
                        or os.stat(t).st_mtime < st.st_mtime):
                    shutil.copy2(s, t)
                    copied += 1
            except OSError:
                continue
    return copied


class RemoteSync:
    """Mirror `local_dir` into `remote_dir` every `frequency` seconds on a
    daemon thread; `final()` does one last blocking sync (main.py:487-494)."""

    def __init__(self, local_dir: str, remote_dir: str, frequency: float = 300):
        self.local_dir = local_dir
        self.remote_dir = remote_dir
        self.frequency = frequency
        self._stop = threading.Event()
        self._thread = None

    def start(self):
        def loop():
            while not self._stop.wait(self.frequency):
                try:
                    _sync_dir(self.local_dir, self.remote_dir)
                except Exception as e:  # noqa: BLE001 — sync must not kill training
                    print(f"remote_sync error: {e}", flush=True)
        self._thread = threading.Thread(target=loop, daemon=True)
        self._thread.start()
        return self

    def final(self) -> int:
        self._stop.set()
        return _sync_dir(self.local_dir, self.remote_dir)
