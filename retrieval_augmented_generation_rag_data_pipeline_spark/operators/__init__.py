from . import (  # noqa: F401
    dedup,
    joins,
    relational,
    retrieval,
    sampling,
    text,
    vectors,
    windows,
)
