"""File downloads with retries, MD5 verification and .md5ok marker caching.

Reference equivalent: base make/FileDownloadGoal.java (HTTP or anonymous-FTP
download with a bounded retry loop, MD5 verification and a `<file>.md5ok`
marker-file cache, ref :243-263,352-399,418-467). file:// URLs are supported
for hermetic/mirrored setups.
"""

from __future__ import annotations

import hashlib
import logging
import shutil
import urllib.request
from pathlib import Path

log = logging.getLogger("genestrip")


def file_md5(path) -> str:
    h = hashlib.md5()
    with open(path, "rb") as f:
        while True:
            b = f.read(1 << 20)
            if not b:
                break
            h.update(b)
    return h.hexdigest()


def md5_ok(path: Path, expected: str | None, use_cache: bool = True) -> bool:
    """ref: FileDownloadGoal.isCheckSumOk + the .md5ok marker cache."""
    if expected is None:
        return True
    marker = Path(str(path) + ".md5ok")
    if use_cache and marker.exists():
        return True
    ok = file_md5(path) == expected.lower()
    if ok and use_cache:
        marker.write_text("ok\n")
    return ok


def download(url: str, target, md5: str | None = None, tries: int = 5,
             use_md5_cache: bool = True) -> Path:
    """Download url to target with bounded retries and MD5 verification."""
    target = Path(target)
    if target.exists() and target.stat().st_size > 0 and md5_ok(target, md5, use_md5_cache):
        return target
    target.parent.mkdir(parents=True, exist_ok=True)
    last_err: Exception | None = None
    for attempt in range(tries):
        try:
            log.info("Downloading %s -> %s (attempt %d)", url, target, attempt + 1)
            tmp = Path(str(target) + ".part")
            with urllib.request.urlopen(url) as resp, open(tmp, "wb") as out:
                shutil.copyfileobj(resp, out, length=1 << 20)
            if md5 is not None and not md5_ok(tmp, md5, use_cache=False):
                tmp.unlink(missing_ok=True)
                raise IOError(f"MD5 mismatch for {url}")
            tmp.replace(target)
            if md5 is not None and use_md5_cache:
                Path(str(target) + ".md5ok").write_text("ok\n")
            return target
        except Exception as e:  # noqa: BLE001 - retry loop
            last_err = e
            log.warning("Download failed (%s): %s", url, e)
    raise IOError(f"Download failed after {tries} tries: {url}") from last_err
