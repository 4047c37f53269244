from .mfcc_kernel import compute_mfccs_pallas  # noqa: F401
from .res_kernel import pack_res_params, res_forward_fused  # noqa: F401
