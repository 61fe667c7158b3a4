from mvsformer_tpu.utils import cams, metrics, pfm
