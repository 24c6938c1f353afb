from .bindings import (  # noqa: F401
    available,
    build,
    encode_fasta_native,
    count_kmers_native,
    merge_union_native,
)
