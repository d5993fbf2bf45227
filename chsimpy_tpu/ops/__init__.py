from .coeffs import eigenvalues, get_coefficients  # noqa: F401
from .dct import dct_matrix, dct2, idct2  # noqa: F401
from .stencil import gradient2d  # noqa: F401
