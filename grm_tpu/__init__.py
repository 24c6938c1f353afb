"""GRM-TPU: a TPU-native antimicrobial-resistance (AMR) phenotype prediction framework.

Re-implements the full compute pipeline of the GRM reference application
(FASTA -> canonical k-mer counting -> genome x k-mer presence bit-matrix ->
Set Covering Machine / CART rule learning -> metrics & sample-compression
bounds) as an idiomatic JAX/XLA/Pallas stack:

- ``grm_tpu.ops``       bit-matrix substrate: MSB-first bit packing, masked
                        popcount column sweeps (the `sum_rows` engine), and
                        canonical k-mer extraction kernels.
- ``grm_tpu.kmer``      FASTA ingest, DSK-equivalent per-genome k-mer counting
                        and the dsk2kover / Ray Surveyor-equivalent distributed
                        matrix builder.
- ``grm_tpu.dataset``   the HDF5 dataset artifact (reference-compatible layout),
                        creation from tsv/contigs/reads, and train/test/fold
                        splits with per-k-mer risk precomputation.
- ``grm_tpu.learning``  SCM and CART learners, models, metrics and
                        sample-compression bounds with bit-identical decision
                        semantics w.r.t. the reference implementation.
- ``grm_tpu.parallel``  jax.sharding device-mesh support: column-sharded k-mer
                        space, data-parallel genome rows, multi-host build.
- ``grm_tpu.collect``   PATRIC/BV-BRC data collection utilities.
"""

__version__ = "0.1.0"

# Large freed buffers must be reused warm, not re-mmapped and re-faulted:
# the host pipeline is page-fault-bound on virtualized hosts otherwise (see
# grm_tpu.hostmem). Two cheap mallopt() calls, gated by GRM_NO_MALLOC_TUNE.
from .hostmem import tune_host_allocator as _tune_host_allocator

_tune_host_allocator()
del _tune_host_allocator
