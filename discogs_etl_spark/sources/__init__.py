"""Sources: XML ingest kernel and dump-manifest/catalog operators."""
