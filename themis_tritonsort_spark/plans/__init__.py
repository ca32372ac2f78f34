"""Job-spec layer: the reference's query IR -> DataFrame pipelines."""
