from .tables import load_table, load_tables, TABLE_NAMES  # noqa: F401
from .tweets import read_tweets_naive, read_tweets_strict, parse_tweets_lines  # noqa: F401
