from .clip_score import CLIPScorer, preprocess_images  # noqa: F401

# NOTE: the scoring function itself lives at
# tdm_tpu.eval.clip_score.clip_score — not re-exported here because the
# name would shadow the submodule on `tdm_tpu.eval.clip_score` imports.
