"""Sources & sinks: cube CSV (dynamic schema), WDS REST client
(driver-side, injectable transport), code sets, table store with
idempotent product-replace semantics, JDBC parity mode."""
