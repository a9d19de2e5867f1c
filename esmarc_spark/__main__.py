from esmarc_spark.cli import main

raise SystemExit(main())
