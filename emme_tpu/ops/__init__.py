from . import bessel, quadrature, kernels, singularity  # noqa: F401
