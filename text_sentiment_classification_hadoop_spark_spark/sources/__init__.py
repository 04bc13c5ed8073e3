from .layout import (  # noqa: F401
    write_bucketed,
    write_partitioned,
    write_zordered,
    zorder_key_txt,
)
from .model_store import (  # noqa: F401
    export_reference_format,
    load_model,
    save_model,
)
from .refmodel_source import RefModelDataSource, register_refmodel  # noqa: F401
from .tables import TABLE_NAMES, load_table, load_tables, normalize_ts  # noqa: F401
from .tweets import parse_tweets_lines, read_tweets_naive, read_tweets_strict  # noqa: F401
