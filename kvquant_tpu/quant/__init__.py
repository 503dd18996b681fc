from .nuq import (
    nearest_codes,
    nearest_values,
    nf_signposts,
    dynamic_minmax,
    quant_zp,
    quant_lut,
)
from .outliers import (
    outlier_budget_per_side,
    static_outlier_mask,
    dynamic_outlier_mask,
    capped_outlier_mask,
    apply_sink_mask,
)
from .kmeans import weighted_kmeans_1d
from .artifacts import (
    KQuantizer,
    VQuantizer,
    LayerQuantizers,
    QuantizerSet,
    save_quantizers,
    load_quantizers,
)
