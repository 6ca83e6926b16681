from pdftableextractor_spark.kernels.layout import (  # noqa: F401
    GAP_MIN,
    LINE_EPS,
    layout_page,
    pdf_layout_kernel,
)
