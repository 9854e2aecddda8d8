"""SHA256-verified CLIP checkpoint download (ref ``model/clip/clip.py:29-68``).

The reference resolves ``MODEL.NAME`` → OpenAI CDN URL and downloads to
``~/.cache/clip`` with a SHA256 check (the expected digest is the URL's
penultimate path component). This is its drop-in equivalent; differences:

* the hash is streamed during download instead of re-reading the file,
* a partial download is written to a ``.partial`` file and renamed only
  after the digest verifies, so an interrupted run never leaves a
  corrupt file where the loader will find it,
* no tqdm dependency (progress via the package logger).

On egress-free hosts the urllib call fails with a clear message telling the
user to drop the file at ``MODEL.PRETRAIN_PATH`` instead (docs/PARITY_RUNS.md).
"""

from __future__ import annotations

import contextlib
import hashlib
import logging
import os
import tempfile
import urllib.request

# OpenAI CLIP release URLs (public constants, ref clip.py:29-36). Only the
# two architectures the reference trains with are kept.
_MODELS = {
    "RN50": "https://openaipublic.azureedge.net/clip/models/afeb0e10f9e5a86da6080e35cf09123aca3b358a0c3e3b6c78a7b63bc04b6762/RN50.pt",
    "ViT-B-16": "https://openaipublic.azureedge.net/clip/models/5806e77cd80f8b59890b7e101eabd078d9fb84e6937f9e85e4ecb61988df416f/ViT-B-16.pt",
}

DEFAULT_ROOT = os.path.expanduser("~/.cache/clip")
_CHUNK = 1 << 20

logger = logging.getLogger("mpreid_tpu")


def _sha256_of(path: str) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(_CHUNK), b""):
            h.update(chunk)
    return h.hexdigest()


def download(url: str, root: str = DEFAULT_ROOT) -> str:
    """Fetch ``url`` into ``root`` with SHA256 verification; return the path.

    The expected digest is the URL's penultimate path component
    (ref clip.py:43). A cached file with a matching digest is reused.
    """
    os.makedirs(root, exist_ok=True)
    filename = os.path.basename(url)
    expected = url.split("/")[-2]
    target = os.path.join(root, filename)

    if os.path.exists(target) and not os.path.isfile(target):
        raise RuntimeError(f"{target} exists and is not a regular file")
    if os.path.isfile(target):
        if _sha256_of(target) == expected:
            return target
        logger.warning(
            "%s exists but its SHA256 does not match; re-downloading", target
        )

    # unique temp file per process: concurrent downloaders must not share a
    # partial path (interleaved writes corrupt both; cleanup could unlink a
    # file the other is still writing). os.replace at the end stays atomic.
    fd, partial = tempfile.mkstemp(
        prefix=filename + ".", suffix=".partial", dir=root
    )
    os.close(fd)
    # mkstemp creates 0600; restore umask-honoring permissions so the final
    # cached checkpoint (os.replace preserves the mode) stays shareable
    cur_umask = os.umask(0)
    os.umask(cur_umask)
    os.chmod(partial, 0o666 & ~cur_umask)
    h = hashlib.sha256()
    done_ok = False
    try:
        with urllib.request.urlopen(url, timeout=60) as source, \
                open(partial, "wb") as out:
            total = int(source.info().get("Content-Length") or 0)
            done = 0
            while True:
                buf = source.read(_CHUNK)
                if not buf:
                    break
                out.write(buf)
                h.update(buf)
                done += len(buf)
                if total:
                    logger.info("downloading %s: %.1f%%", filename, 100 * done / total)
    except OSError as e:
        raise RuntimeError(
            f"Could not download {url} ({e}). On an egress-free host, place "
            f"the file at {target} manually and/or set MODEL.PRETRAIN_PATH "
            "(see docs/PARITY_RUNS.md)."
        ) from e
    else:
        if h.hexdigest() != expected:
            raise RuntimeError(
                f"Downloaded {url} but the SHA256 checksum does not match"
            )
        os.replace(partial, target)
        done_ok = True
        return target
    finally:
        # any exit without the rename (OSError, bad digest, KeyboardInterrupt,
        # non-OSError urllib failures) must not leak the uniquely-named temp
        if not done_ok:
            with contextlib.suppress(FileNotFoundError):
                os.remove(partial)


def download_clip(model_name: str, root: str = DEFAULT_ROOT) -> str:
    """``MODEL.NAME`` → verified local checkpoint path (ref clip.py:39-68)."""
    if model_name not in _MODELS:
        raise ValueError(
            f"No released CLIP checkpoint for {model_name!r}; "
            f"expected one of {sorted(_MODELS)}"
        )
    return download(_MODELS[model_name], root)
