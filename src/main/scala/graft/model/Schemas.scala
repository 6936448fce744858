package graft.model

import org.apache.spark.sql.types._

/** Schema constants for every table the engine serves (SURVEY.md §1.4).
  *
  * The "read-as-string, cast-later" CSV schemas mirror the reference's
  * deliberate pattern (reference `code/spark-jobs/raw_to_landing_sparkjob.py:13-29`
  * Kaggle, `:63-75` API): raw financial CSVs carry comma-formatted volumes and
  * metadata junk rows, so every column is read as string and cast explicitly
  * downstream.
  */
object Schemas {

  /** Kaggle OHLCV file schema (header present); all-string on read.
    * Reference: `raw_to_landing_sparkjob.py:13-29`. */
  val kaggleRaw: StructType = StructType(
    Seq("Date", "Open", "High", "Low", "Close", "Volume", "OpenInt")
      .map(StructField(_, StringType, nullable = true)))

  /** API (yfinance) OHLCV file schema (headerless, first 4 rows are
    * metadata); all-string on read. Column order differs from Kaggle.
    * Reference: `raw_to_landing_sparkjob.py:63-75`. */
  val apiRaw: StructType = StructType(
    Seq("Date", "AdjClose", "Close", "High", "Low", "Open", "Volume")
      .map(StructField(_, StringType, nullable = true)))

  /** Standardized open/close schema after cleaning (pre-Ticker/year).
    * Reference output shape: `raw_to_landing_sparkjob.py:93-102`. */
  val openCloseStd: StructType = StructType(Seq(
    StructField("Date", DateType),
    StructField("Open", DoubleType),
    StructField("High", DoubleType),
    StructField("Low", DoubleType),
    StructField("Close", DoubleType),
    StructField("Volume", DoubleType),
    StructField("Source", StringType)))

  /** Company-info JSON projection: 11 fields with `""` defaults for missing
    * keys (note `address1` -> `address`).
    * Reference: `code/scripts/transform_and_copy_to_landing_info.py:46-58`. */
  val infoFields: Seq[String] = Seq(
    "symbol", "shortName", "industry", "sector", "fullTimeEmployees",
    "totalRevenue", "address", "city", "state", "zip", "website")

  /** Explicit read schema for the info JSON documents (source key names). */
  val infoJson: StructType = StructType(Seq(
    StructField("symbol", StringType),
    StructField("shortName", StringType),
    StructField("industry", StringType),
    StructField("sector", StringType),
    StructField("fullTimeEmployees", LongType),
    StructField("totalRevenue", LongType),
    StructField("address1", StringType),
    StructField("city", StringType),
    StructField("state", StringType),
    StructField("zip", StringType),
    StructField("website", StringType)))

  private val peerStruct = StructType(Seq(
    StructField("min", DoubleType),
    StructField("avg", DoubleType),
    StructField("max", DoubleType)))

  /** Nested ESG document schema; four `peer*Performance` structs contribute
    * only their `avg`. Reference:
    * `code/scripts/transform_and_copy_to_landing_sustainability.py:46-92`. */
  val sustainabilityJson: StructType = StructType(Seq(StructField("esgScores",
    StructType(Seq(
      StructField("adult", BooleanType),
      StructField("alcoholic", BooleanType),
      StructField("animalTesting", BooleanType),
      StructField("catholic", BooleanType),
      StructField("coal", BooleanType),
      StructField("controversialWeapons", BooleanType),
      StructField("environmentPercentile", DoubleType),
      StructField("environmentScore", DoubleType),
      StructField("esgPerformance", StringType),
      StructField("furLeather", BooleanType),
      StructField("gambling", BooleanType),
      StructField("governanceScore", DoubleType),
      StructField("maxAge", LongType),
      StructField("militaryContract", BooleanType),
      StructField("nuclear", BooleanType),
      StructField("palmOil", BooleanType),
      StructField("peerCount", LongType),
      StructField("peerEnvironmentPerformance", peerStruct),
      StructField("peerEsgScorePerformance", peerStruct),
      StructField("peerGovernancePerformance", peerStruct),
      StructField("peerGroup", StringType),
      StructField("peerHighestControversyPerformance", peerStruct),
      StructField("peerSocialPerformance", peerStruct),
      StructField("percentile", DoubleType),
      StructField("pesticides", BooleanType),
      StructField("ratingMonth", LongType),
      StructField("ratingYear", LongType),
      StructField("smallArms", BooleanType),
      StructField("socialScore", DoubleType),
      StructField("tobacco", BooleanType),
      StructField("totalEsg", DoubleType))))))

  /** The 31 flattened sustainability output fields, in reference order
    * (`transform_and_copy_to_landing_sustainability.py:46-92`); the four
    * `peer*Performance` entries are struct-`avg` extractions. */
  val sustainabilityFields: Seq[String] = Seq(
    "adult", "alcoholic", "animalTesting", "catholic", "coal",
    "controversialWeapons", "environmentPercentile", "environmentScore",
    "esgPerformance", "furLeather", "gambling", "governanceScore", "maxAge",
    "militaryContract", "nuclear", "palmOil", "peerCount",
    "peerEnvironmentPerformance", "peerEsgScorePerformance",
    "peerGovernancePerformance", "peerGroup",
    "peerHighestControversyPerformance", "peerSocialPerformance",
    "percentile", "pesticides", "ratingMonth", "ratingYear", "smallArms",
    "socialScore", "tobacco", "totalEsg")

  /** ANALYSTRECCOMENDATIONS warehouse table (reference `code/sql/DDLs:18-29`
    * [sic, the DDL's spelling]; ingested one yfinance recommendations frame
    * per ticker at `ingest_data_API.py:98-100`): monthly analyst rating
    * snapshots. DDL types: Date DATE, Period VARCHAR(50), the five rating
    * buckets INT, Ticker VARCHAR(10), UNIQUE (Ticker, Date). */
  val analystRecommendations: StructType = StructType(Seq(
    StructField("Date", DateType, nullable = false),
    StructField("Period", StringType),
    StructField("StrongBuy", IntegerType),
    StructField("Buy", IntegerType),
    StructField("Hold", IntegerType),
    StructField("Sell", IntegerType),
    StructField("StrongSell", IntegerType),
    StructField("Ticker", StringType, nullable = false)))

  /** DIVIDEND_HISTORY warehouse table (reference `code/sql/DDLs:165-170`;
    * ingested one dividends series per ticker at
    * `ingest_data_API.py:107-110`): (Ticker, Date)-keyed dividend amounts,
    * DECIMAL(20,2) per the DDL — exact fixed-point, no float rounding. */
  val dividendHistory: StructType = StructType(Seq(
    StructField("Ticker", StringType, nullable = false),
    StructField("Date", DateType, nullable = false),
    StructField("Dividends", DecimalType(20, 2))))

  /** Ticker dimension (stock_list.csv). Reference: `stock_list.csv:1`. */
  val stockList: StructType = StructType(Seq(
    StructField("Rank", IntegerType),
    StructField("Company", StringType),
    StructField("Ticker", StringType),
    StructField("State", StringType),
    StructField("Industry", StringType),
    StructField("Revenue (USD)", StringType)))
}

/** Warehouse DDL typing (reference `code/sql/DDLs:32-250`): the declared
  * column types of the statement warehouse tables — share counts `BIGINT`
  * (DDLs:35-37), rate/per-share metrics `DECIMAL(10,4)` (DDLs:191,208-209
  * and the INCOMESTATEMENT5Y twins), every other metric `DECIMAL(20,2)`.
  * Metric display names normalize to the DDL's underscore column
  * spellings, including its two irregular word splits.
  *
  * Spark mapping: `DECIMAL(p,s)` is `DecimalType(p, s)` exactly — fixed
  * point, no binary-float rounding — so warehouse arithmetic (sums,
  * differences) is exact at any scale, unlike the upstream
  * all-double landing shape.
  */
object WarehouseDdl {

  val money: DecimalType = DecimalType(20, 2)
  val ratio: DecimalType = DecimalType(10, 4)

  /** BIGINT share-count metrics (`DDLs:35-37`). */
  val bigintMetrics: Set[String] = Set(
    "Treasury Shares Number", "Ordinary Shares Number", "Share Issued")

  /** DECIMAL(10,4) rate / per-share metrics (`DDLs:191,208-209`). */
  val ratioMetrics: Set[String] = Set(
    "Tax Rate For Calcs", "Diluted EPS", "Basic EPS")

  /** The declared warehouse type of a statement metric. */
  def metricType(metric: String): DataType =
    if (bigintMetrics.contains(metric)) LongType
    else if (ratioMetrics.contains(metric)) ratio
    else money

  /** DDL column spellings that are not a plain space-to-underscore swap
    * (`DDLs:48,82`). */
  private val ddlSpelling: Map[String, String] = Map(
    "Tradeand Other Payables Non Current" -> "Trade_and_Other_Payables_Non_Current",
    "Investmentin Financial Assets" -> "Investment_in_Financial_Assets")

  /** The DDL column name of a statement metric. */
  def columnName(metric: String): String =
    ddlSpelling.getOrElse(metric, metric.replace(' ', '_'))

  /** The DDL-typed StructType of a transposed statement sheet as the
    * warehouse declares it: Ticker, Date, then one typed column per
    * allowlisted metric in sheet order. (QUARTERLY's extra `Quarter`
    * key column is out of scope — the engine keys periods by Date.)
    */
  def statementSchema(sheet: String): StructType = StructType(
    StructField("Ticker", StringType, nullable = false) +:
    StructField("Date", DateType, nullable = false) +:
    StatementMetrics.bySheet(sheet).map(m =>
      StructField(columnName(m), metricType(m))))
}

/** Financial-statement metric allowlists: rows of the wide statement matrix
  * kept during the transpose (SURVEY.md §2.7 R1 / P7). These are the
  * reference's semantic data model, not code — cited from
  * `code/scripts/transform_job_tabular_entitities.py:117-317`
  * (60 balance_sheet / 53 cash_flow / 39 income_statement / 39 quarterly).
  */
object StatementMetrics {

  val balanceSheet: Seq[String] = Seq(
    "Treasury Shares Number", "Ordinary Shares Number", "Share Issued",
    "Net Debt", "Total Debt", "Tangible Book Value", "Invested Capital",
    "Working Capital", "Net Tangible Assets", "Capital Lease Obligations",
    "Common Stock Equity", "Total Capitalization",
    "Total Equity Gross Minority Interest", "Stockholders Equity",
    "Gains Losses Not Affecting Retained Earnings", "Other Equity Adjustments",
    "Retained Earnings", "Capital Stock", "Common Stock",
    "Total Liabilities Net Minority Interest",
    "Total Non Current Liabilities Net Minority Interest",
    "Other Non Current Liabilities", "Tradeand Other Payables Non Current",
    "Long Term Debt And Capital Lease Obligation",
    "Long Term Capital Lease Obligation", "Long Term Debt",
    "Current Liabilities", "Other Current Liabilities",
    "Current Deferred Liabilities", "Current Deferred Revenue",
    "Current Debt And Capital Lease Obligation",
    "Current Capital Lease Obligation", "Current Debt",
    "Other Current Borrowings", "Commercial Paper",
    "Payables And Accrued Expenses", "Payables", "Total Tax Payable",
    "Income Tax Payable", "Accounts Payable", "Total Assets",
    "Total Non Current Assets", "Other Non Current Assets",
    "Non Current Deferred Assets", "Non Current Deferred Taxes Assets",
    "Investments And Advances", "Other Investments",
    "Investmentin Financial Assets", "Available For Sale Securities",
    "Net PPE", "Accumulated Depreciation", "Gross PPE", "Leases",
    "Other Properties", "Machinery Furniture Equipment",
    "Land And Improvements", "Properties", "Current Assets",
    "Other Current Assets", "Inventory")

  val cashFlow: Seq[String] = Seq(
    "Free Cash Flow", "Repurchase Of Capital Stock", "Repayment Of Debt",
    "Issuance Of Debt", "Issuance Of Capital Stock", "Capital Expenditure",
    "Interest Paid Supplemental Data", "Income Tax Paid Supplemental Data",
    "End Cash Position", "Beginning Cash Position", "Changes In Cash",
    "Financing Cash Flow", "Cash Flow From Continuing Financing Activities",
    "Net Other Financing Charges", "Cash Dividends Paid",
    "Common Stock Dividend Paid", "Net Common Stock Issuance",
    "Common Stock Payments", "Common Stock Issuance",
    "Net Issuance Payments Of Debt", "Net Short Term Debt Issuance",
    "Net Long Term Debt Issuance", "Long Term Debt Payments",
    "Long Term Debt Issuance", "Investing Cash Flow",
    "Cash Flow From Continuing Investing Activities",
    "Net Other Investing Changes", "Net Investment Purchase And Sale",
    "Sale Of Investment", "Purchase Of Investment",
    "Net Business Purchase And Sale", "Purchase Of Business",
    "Net PPE Purchase And Sale", "Purchase Of PPE", "Operating Cash Flow",
    "Cash Flow From Continuing Operating Activities",
    "Change In Working Capital", "Change In Other Working Capital",
    "Change In Other Current Liabilities", "Change In Other Current Assets",
    "Change In Payables And Accrued Expense", "Change In Payable",
    "Change In Account Payable", "Change In Inventory",
    "Change In Receivables", "Changes In Account Receivables",
    "Other Non Cash Items", "Stock Based Compensation", "Deferred Tax",
    "Deferred Income Tax", "Depreciation Amortization Depletion",
    "Depreciation And Amortization", "Net Income From Continuing Operations")

  val incomeStatement: Seq[String] = Seq(
    "Tax Effect Of Unusual Items", "Tax Rate For Calcs", "Normalized EBITDA",
    "Net Income From Continuing Operation Net Minority Interest",
    "Reconciled Depreciation", "Reconciled Cost Of Revenue", "EBITDA", "EBIT",
    "Net Interest Income", "Interest Expense", "Interest Income",
    "Normalized Income",
    "Net Income From Continuing And Discontinued Operation", "Total Expenses",
    "Total Operating Income As Reported", "Diluted Average Shares",
    "Basic Average Shares", "Diluted EPS", "Basic EPS",
    "Diluted NI Availto Com Stockholders", "Net Income Common Stockholders",
    "Net Income", "Net Income Including Noncontrolling Interests",
    "Net Income Continuous Operations", "Tax Provision", "Pretax Income",
    "Other Income Expense", "Other Non Operating Income Expenses",
    "Net Non Operating Interest Income Expense",
    "Interest Expense Non Operating", "Interest Income Non Operating",
    "Operating Income", "Operating Expense", "Research And Development",
    "Selling General And Administration", "Gross Profit", "Cost Of Revenue",
    "Total Revenue", "Operating Revenue")

  /** Quarterly uses the same metric set as income_statement
    * (`transform_job_tabular_entitities.py:276-316`). */
  val quarterly: Seq[String] = incomeStatement

  val bySheet: Map[String, Seq[String]] = Map(
    "balance_sheet" -> balanceSheet,
    "cash_flow" -> cashFlow,
    "income_statement" -> incomeStatement,
    "quarterly" -> quarterly)
}
