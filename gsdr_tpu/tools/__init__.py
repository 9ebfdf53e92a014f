"""Command-line tools: file-to-file SDR pipelines on top of the framework."""
