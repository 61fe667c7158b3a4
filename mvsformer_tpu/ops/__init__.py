from mvsformer_tpu.ops import correlation, geometry, hypotheses, losses, regression, resize
