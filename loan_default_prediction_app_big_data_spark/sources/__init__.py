from .readers import load_tables, read_csv, read_loan_csv, read_parquet_table

__all__ = ["load_tables", "read_csv", "read_loan_csv", "read_parquet_table"]
