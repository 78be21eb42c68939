"""Transformer operator set (SURVEY §2.4) — import to register all."""

from transferia_spark.operators.base import (  # noqa: F401
    Routed,
    Transformation,
    Transformer,
    build,
    known_types,
    register,
)

# importing the modules registers every transformer type
from transferia_spark.operators import (  # noqa: F401,E402
    casts,
    corpus,
    curation,
    custom_example,
    dbt,
    dedup,
    docs,
    embed,
    filters,
    joins,
    misc,
    multimodal,
    routing,
    similarity,
    sql,
    textstats,
    values,
)
from transferia_spark.operators.joins import asof_join, range_join  # noqa: F401

from transferia_spark.operators.filters import (  # noqa: F401
    FilterColumns,
    FilterRows,
    FilterRowsByIds,
    SkipEvents,
    compile_filter,
)
from transferia_spark.operators.casts import ConvertToDatetime, ConvertToString, NumberToFloat  # noqa: F401
from transferia_spark.operators.routing import RenameTables, Sharder, TableSplitter  # noqa: F401
from transferia_spark.operators.values import (  # noqa: F401
    MaskField,
    MongoPkExtender,
    RegexReplace,
    ReplacePrimaryKey,
)
from transferia_spark.operators.sql import SqlTransformer  # noqa: F401
from transferia_spark.operators.docs import RawCdcDocGrouper, RawDocGrouper, YtDict  # noqa: F401
from transferia_spark.operators.misc import (  # noqa: F401
    BatchSplitter,
    JsonParser,
    LambdaTransformer,
    LoggerTransformer,
    ProblemItemDetector,
)
from transferia_spark.operators.dedup import (  # noqa: F401
    DedupEmbeddingCosine,
    DedupExact,
    DedupMinHashLSH,
    DedupNgramJaccard,
    DedupSimHash,
)
from transferia_spark.operators.similarity import (  # noqa: F401
    AnnBruteForce,
    AnnIVF,
    AnnLshBucketed,
)
from transferia_spark.operators.corpus import (  # noqa: F401
    Decontaminate,
    DedupCluster,
    GlobalShuffle,
    PackSequences,
    QuotaCap,
)
from transferia_spark.operators.textstats import (  # noqa: F401
    Fingerprint,
    LangId,
    QualityScore,
    TokenCount,
)
from transferia_spark.operators.multimodal import FrameSample, MediaDecode  # noqa: F401
