"""CDC control plane + snapshot seeding + streaming operators.

The reference's two dataflow pipelines (prepare / initialize,
reference: src/cdc_init/core.clj:34-182) and its Kafka control loop
(components/initializer.clj) re-expressed for Spark: batch catch-up is a
DataFrame compaction, the live tail is Structured Streaming, the seed
snapshot is a DataFrame projection into keyed canonical-JSON messages.
"""
