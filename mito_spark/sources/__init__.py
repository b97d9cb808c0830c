"""Sources, sinks and decoders: local files (binary/CSV/NDJSON/zip/
gzip), XML with XSD typing, HTTP request/response maps with rate-limit
policy interpretation."""
