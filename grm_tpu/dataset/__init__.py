from .artifact import GrmDataset  # noqa: F401
from .create import from_contigs, from_reads, from_tsv  # noqa: F401
from .split import split_with_ids, split_with_proportion  # noqa: F401
