"""retrieval_scaling_tpu — a TPU-native retrieval-datastore framework.

A ground-up JAX/XLA/Pallas rebuild of the MassiveDS stack
(RulinShao/retrieval-scaling): datastore construction (chunk -> embed ->
index), approximate nearest-neighbor search (Flat / IVF-Flat / IVF-PQ
implemented from scratch on TPU), retrieval post-processing, RAG evaluation,
and low-latency sharded serving over a TPU device mesh.

Layering (bottom to top):
  ops/       Pallas TPU kernels + XLA compute primitives (flash attention,
             streaming top-k, k-means, PQ/ADC).
  models/    Pure-functional JAX models (Contriever/BERT encoder,
             GPT-NeoX/Pythia reader) + HF checkpoint conversion.
  index/     TPU-resident vector indexes with on-disk (de)serialization.
  parallel/  Device-mesh utilities and cross-shard top-k merge collectives.
  data/      Host-side data layer: byte-range jsonl sharding, chunking,
             passage stores, position-id maps (reference artifact contract).
  search/    Offline search drivers, multi-index/multi-source merging,
             post-processing (dedup, decontamination, rerank, subsample).
  evals/     Perplexity + downstream RAG evaluation with the JAX reader.
  serve/     Online serving: batched query engine + HTTP frontend.
  pipeline/  Config-driven task sequencer (the `ric/main_ric.py` analog).
"""

__version__ = "0.1.0"

from retrieval_scaling_tpu.config import Config, load_config, config_from_dict  # noqa: F401
