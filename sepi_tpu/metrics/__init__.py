from .det import (
    DetCurve,
    compute_det,
    eer,
    export_det_curve,
    ppndf,
    min_dcf,
    SRE08_DCF,
    SRE10_DCF,
    evaluate_scores,
    EvalResult,
)

__all__ = [
    "DetCurve",
    "compute_det",
    "eer",
    "export_det_curve",
    "ppndf",
    "min_dcf",
    "SRE08_DCF",
    "SRE10_DCF",
    "evaluate_scores",
    "EvalResult",
]
