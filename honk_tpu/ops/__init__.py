from .mfcc_kernel import compute_mfccs_pallas  # noqa: F401
