"""Single-file staging for FileStreamSource drains.

Spark's file stream source requires a DIRECTORY basePath; every drain
in this package that accepts a single parquet file stages a symlink
inside a temp dir (the testdata is read-only — never copied). Five
modules carried verbatim copies of this logic, and every copy shared
the same latent flaw: ``os.symlink`` stores the target string
VERBATIM, so a RELATIVE input path produced a symlink that resolves
relative to the temp dir — a broken link the file source reads as
zero files, i.e. a silently empty stream. One shared helper, one
``abspath``, five call sites.
"""

from __future__ import annotations

import os
import tempfile


def stage_single_file(path: str, prefix: str = "dynagraph_stream_src_") -> str:
    """If ``path`` is a single file, return a fresh temp directory
    containing a symlink to it (absolute target — see module
    docstring); directories pass through unchanged."""
    if not os.path.isfile(path):
        return path
    stage = tempfile.mkdtemp(prefix=prefix)
    target = os.path.abspath(path)
    os.symlink(target, os.path.join(stage, os.path.basename(target)))
    return stage
