from transferia_spark.plans.transfer import (  # noqa: F401
    TransferSpec,
    TransferType,
    activate,
    upload,
)
