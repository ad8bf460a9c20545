"""HF Hub push — the reference's `--push_to_hub` surface.

Rebuilds `create_repo` + `upload_folder` (`src/main.py:36,125-128`) behind a
single call. Network access is environment-dependent (this build runs with
zero egress); failures surface as actionable errors instead of hangs.
"""

from __future__ import annotations

import os
from typing import Optional


def push_to_hub(
    folder: str,
    repo_id: str,
    *,
    token: Optional[str] = None,
    private: bool = True,
    commit_message: str = "tdm_tpu checkpoint",
) -> str:
    """Create (if needed) and upload `folder` to `repo_id`; returns the repo
    URL. Requires `huggingface_hub` and a token (arg or HF_TOKEN env)."""
    token = token or os.environ.get("HF_TOKEN")
    if not token:
        raise RuntimeError(
            "push_to_hub needs a token: pass token= or set HF_TOKEN "
            "(reference flag --hub_token, src/args.py)"
        )
    try:
        from huggingface_hub import HfApi
    except ImportError as e:  # pragma: no cover - env without the package
        raise RuntimeError("huggingface_hub is not installed") from e
    api = HfApi(token=token)
    url = api.create_repo(repo_id, exist_ok=True, private=private).repo_id
    api.upload_folder(
        repo_id=repo_id, folder_path=folder, commit_message=commit_message
    )
    return url
