"""Source/sink/store implementations: file-backed (local/test) and
Kafka-backed (deployment) realizations of the storage protocols."""
