from .collect import BatchedCollector, create_collector
