"""Pipeline stages: extract -> mentions/tokens -> triples -> link -> canon -> materialize."""
