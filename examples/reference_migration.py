#!/usr/bin/env python
"""Drop-in migration of the reference app onto this engine.

Step-for-step mirror of what the reference's two entry points do —
``python spark.py`` (batch ML, reference spark.py:15-81) and the
Streamlit app's compute path (reference app.py:30-205) — expressed
through this engine's public API. A reference user runs THIS instead
and gets the same computations with modern Spark semantics (pinned
schema option, seeded split, both scaler modes, µs serving).

Run: ``python examples/reference_migration.py [path/to/Loan_Default.csv]``
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from loan_default_prediction_app_big_data_spark.ml import (
    LoanModel,
    fit_loan_model,
    predict_single_row,
)
from loan_default_prediction_app_big_data_spark.ml.serving import (
    extract_serving_params,
    predict_local,
)
from loan_default_prediction_app_big_data_spark.session import get_spark
from loan_default_prediction_app_big_data_spark.sources.readers import (
    read_loan_csv,
    viz_feed,
)


def main() -> None:
    csv_path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "data",
        "Loan_Default.csv",
    )

    # --- reference spark.py:15-26: session setup (modern SparkSession) --
    spark = get_spark(app_name="Loan_Default_Prediction")

    # --- spark.py:29-35: load, schema, preview ---------------------------
    # inferSchema=True replays the reference exactly; the engine default
    # is the pinned schema (skips the inference scan).
    df = read_loan_csv(spark, csv_path, infer_schema=True)
    df.printSchema()
    df.show(5)

    # --- spark.py:38-78: impute -> assemble -> scale -> split -> LR ------
    # (seeded split fixes the reference's irreproducible spark.py:59)
    model = fit_loan_model(df)
    print(f"ROC-AUC: {model.roc_auc}")  # spark.py:73
    print(f"Accuracy: {model.accuracy}")  # spark.py:78

    # --- app.py:76-78 semantics (sklearn center+scale, train-only fit) ---
    model_sklearn_semantics = fit_loan_model(
        df, with_mean=True, fit_scope_train_only=True
    )
    print(f"ROC-AUC (center+scale, train-fit): {model_sklearn_semantics.roc_auc}")

    # --- app.py:126-127: per-epoch loss log -> objectiveHistory ----------
    print("objectiveHistory:", [round(x, 5) for x in model.objective_history[:5]], "...")

    # --- app.py:130/137-143: save + load round trip ----------------------
    out_dir = os.path.join("/tmp", "loan_model_example")
    model.save(out_dir)
    pre, lr = LoanModel.load_transformers(out_dir)
    print("model reloaded from", out_dir)

    # --- app.py:152-205: single-row prediction + rule override -----------
    user_input = {
        "loan_amount": 10_000.0,  # the app's widget defaults, app.py:153-158
        "rate_of_interest": 5.0,
        "property_value": 200_000.0,
        "income": 50_000.0,
        "Credit_Score": 700.0,
        "LTV": 80.0,
    }
    res = predict_single_row(spark, pre, lr, user_input)
    print("prediction:", res["final_prediction"], "-", res["verdict"])

    # latency-critical twin: same math, no Spark job (~5 us/row)
    params = extract_serving_params(pre, lr)
    print("local twin agrees:", predict_local(params, user_input)["final_prediction"]
          == res["final_prediction"])

    # --- app.py:130/137-143: import the DEPLOYED torch checkpoint --------
    # A migrating user brings loan_prediction_model.pth with them; the
    # engine reads the state_dict without torch and serves it through
    # the same predict_local path (softmax class-1 == sigmoid of the
    # weight-row difference).
    pth = "/root/reference/loan_prediction_model.pth"
    if os.path.exists(pth):
        from loan_default_prediction_app_big_data_spark.ml.torch_import import (
            serving_params_from_torch,
        )

        torch_params = serving_params_from_torch(
            pth,
            surrogates=params["surrogates"],
            scaler_mean=params["scaler_mean"],
            scaler_std=params["scaler_std"],
        )
        t_res = predict_local(torch_params, user_input)
        print("deployed torch model:", t_res["final_prediction"], "-", t_res["verdict"])

    # --- app.py:214-245: sampled viz feed (rendering out of scope) -------
    pdf = viz_feed(df, ["loan_amount", "rate_of_interest", "age"], n=100)
    print(f"viz feed: {len(pdf)} rows x {list(pdf.columns)}")

    # --- beyond the reference: scorecard validation on the model's own
    # predictions (functions/risk.py) — KS, gains/lift, banded AUC —
    # and CrossValidator tuning (ml/tuning.py). The reference prints a
    # single AUC/accuracy (spark.py:73-78); this is the full readout a
    # credit shop signs off on.
    from pyspark.ml.functions import vector_to_array
    from pyspark.sql import functions as F

    from loan_default_prediction_app_big_data_spark.functions import risk
    from loan_default_prediction_app_big_data_spark.ml.loan_pipeline import (
        cast_features_double,
        seeded_split,
    )

    pre_model = pre  # reuse the loaded preprocessing transformers
    _, test = seeded_split(pre_model.transform(cast_features_double(df)))
    scored = lr.transform(test).select(
        vector_to_array("probability")[1].alias("p"), F.col("Status")
    )
    bands = risk.band_counts(
        scored,
        score=F.col("p"),
        label=F.col("Status"),
        band=F.floor(F.col("p") * 10).cast("bigint"),
    ).cache()
    print("banded AUC:", risk.auc_banded(bands).collect()[0]["auc"])
    print("KS:", risk.ks_table(bands).collect()[0]["ks_stat"])
    top_gain = max(risk.gains_table(bands).collect(), key=lambda r: r["band"])
    print(f"top-band lift: {top_gain['lift']}  capture: {top_gain['capture_rate']}")

    from loan_default_prediction_app_big_data_spark.ml.tuning import (
        tune_with_holdout,
    )

    tuned = tune_with_holdout(df, num_folds=2)
    print(
        f"CV best: regParam={tuned.best_reg_param} "
        f"elasticNet={tuned.best_elastic_net} "
        f"cv_auc={tuned.best_cv_auc:.4f} holdout_auc={tuned.holdout_auc:.4f}"
    )

    spark.stop()


if __name__ == "__main__":
    main()
