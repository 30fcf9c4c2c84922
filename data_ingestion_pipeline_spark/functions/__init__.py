from data_ingestion_pipeline_spark.functions.exact import dec_avg, dec_sum, dec_sum_expr

__all__ = ["dec_avg", "dec_sum", "dec_sum_expr"]
