from sunode_tpu.sample.nuts import nuts_sample, NUTSResult
from sunode_tpu.sample.diagnostics import split_rhat, ess_bulk

__all__ = ["nuts_sample", "NUTSResult", "split_rhat", "ess_bulk"]
