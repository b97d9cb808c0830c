"""Composed multi-operator plans (pipelines) built from the function
and operator layers."""
