from jckx.metrics.metrics import Metrics  # noqa: F401
from jckx.metrics.fid import (  # noqa: F401
    frechet_distance,
    inception_score_from_probs,
    newton_schulz_sqrtm,
    psd_sqrtm,
)
