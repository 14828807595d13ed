package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.etl.binary.{Base58, BorshMetadata, SplToken}
import graft.etl.model._

/** Owner-dispatched enrichment (F6-F11, P3-P6, G1, A2-A3 — SURVEY.md §2).
  *
  * The reference checks `owner` BEFORE touching the payload
  * (sqlite.rs:206-216) — in Spark that ordering is the `when(owner === …,
  * decode(data))` projection: Catalyst evaluates the cheap equality first
  * and the decode UDF only on matching rows, and the owner filter pushes
  * down to the scan when reading from Parquet-backed state.
  *
  * Decode results are nullable structs ⇒ enrichment adds columns without
  * rewriting the base table (the engine's schema-evolution surface).
  */
object Enrich {

  // decode rows (nullable struct fields mirror sqlite.rs DDL, FIXTURES.md §3)
  final case class TokenAccountRow(mint: Array[Byte], owner: Array[Byte], amount: Long,
      delegate: Option[Array[Byte]], state: Short, isNative: Option[Long],
      delegatedAmount: Long, closeAuthority: Option[Array[Byte]])
  final case class MintRow(mintAuthority: Option[Array[Byte]], supply: Long,
      decimals: Short, isInitialized: Boolean, freezeAuthority: Option[Array[Byte]])
  final case class MultisigRow(m: Short, n: Short, signers: Seq[Array[Byte]])
  final case class CreatorRow(address: Array[Byte], verified: Boolean, share: Short)
  final case class MetadataRow(updateAuthority: Array[Byte], mint: Array[Byte],
      name: String, symbol: String, uri: String, sellerFeeBasisPoints: Int,
      creators: Option[Seq[CreatorRow]], primarySaleHappened: Boolean, isMutable: Boolean,
      editionNonce: Option[Short], tokenStandard: Option[Short],
      collectionVerified: Option[Boolean], collectionKey: Option[Array[Byte]],
      useMethod: Option[Short], usesRemaining: Option[Long], usesTotal: Option[Long])

  private val tokenAccountUdf = udf((data: Array[Byte]) =>
    SplToken.unpackTokenAccount(data).map(t => TokenAccountRow(t.mint, t.owner, t.amount,
      t.delegate, t.state, t.isNative, t.delegatedAmount, t.closeAuthority)))

  private val mintUdf = udf((data: Array[Byte]) =>
    SplToken.unpackMint(data).map(m => MintRow(m.mintAuthority, m.supply, m.decimals,
      m.isInitialized, m.freezeAuthority)))

  private val multisigUdf = udf((data: Array[Byte]) =>
    SplToken.unpackMultisig(data).map(ms => MultisigRow(ms.m, ms.n, ms.signers)))

  /** Borsh metadata decode. Skip guards → null; a bad body under a
    * MetadataV1 key is an ERROR, matching the reference's fail-fast
    * (sqlite.rs:337-342). */
  private val metadataUdf = udf((data: Array[Byte]) => BorshMetadata.decode(data) match {
    case BorshMetadata.Decoded(m) => Some(MetadataRow(m.updateAuthority, m.mint, m.name,
      m.symbol, m.uri, m.sellerFeeBasisPoints,
      m.creators.map(_.map(c => CreatorRow(c.address, c.verified, c.share))),
      m.primarySaleHappened, m.isMutable, m.editionNonce, m.tokenStandard,
      m.collectionVerified, m.collectionKey, m.useMethod, m.usesRemaining, m.usesTotal))
    case BorshMetadata.Skip => None
    case BorshMetadata.Malformed(msg) => throw new IllegalStateException(
      s"bad Metadata body (sqlite.rs:337-342 fail-fast): $msg")
  })

  val TokenProgram: Array[Byte] = SplToken.ProgramId
  val MetadataProgram: Array[Byte] = BorshMetadata.ProgramId

  private def ownerIs(id: Array[Byte]): Column = col("owner") === lit(id)

  /** Wide-row enrichment: base columns + nullable per-program structs
    * (north-star "schema-evolving enrichment columns"). Wrong-size token
    * payloads yield nulls (warn-skip, sqlite.rs:252-258) and are counted via
    * `observe` as dead-letter metrics, not failures (F10). */
  def enrich(accounts: DataFrame): DataFrame =
    accounts
      .withColumn("token_account",
        when(ownerIs(TokenProgram) && length(col("data")) === SplToken.TokenAccountSize,
          tokenAccountUdf(col("data"))))
      .withColumn("token_mint",
        when(ownerIs(TokenProgram) && length(col("data")) === SplToken.MintSize,
          mintUdf(col("data"))))
      .withColumn("token_multisig",
        when(ownerIs(TokenProgram) && length(col("data")) === SplToken.MultisigSize,
          multisigUdf(col("data"))))
      .withColumn("token_metadata",
        when(ownerIs(MetadataProgram), metadataUdf(col("data"))))

  /** Dead-letter observation: rows owned by the token program whose payload
    * matches no known size (F10). Attach before an action to collect. */
  def observeDeadLetters(accounts: DataFrame, name: String = "enrich_stats"): DataFrame =
    accounts.observe(name,
      count(lit(1)).as("accounts"),
      count(when(ownerIs(TokenProgram) &&
        !length(col("data")).isin(SplToken.TokenAccountSize, SplToken.MintSize, SplToken.MultisigSize),
        1)).as("token_size_skips"))

  // --- sink-table projections (sqlite.rs:96-162 DDL ≙ FIXTURES.md §3) ---

  def tokenAccounts(accounts: DataFrame): DataFrame =
    enrich(accounts).filter(col("token_account").isNotNull)
      .select(col("pubkey"), col("token_account.mint").as("mint"),
        col("token_account.owner").as("token_owner"), col("token_account.amount").as("amount"),
        col("token_account.delegate").as("delegate"), col("token_account.state").as("state"),
        col("token_account.isNative").as("is_native"),
        col("token_account.delegatedAmount").as("delegated_amount"),
        col("token_account.closeAuthority").as("close_authority"))

  def tokenMints(accounts: DataFrame): DataFrame =
    enrich(accounts).filter(col("token_mint").isNotNull)
      .select(col("pubkey"), col("token_mint.mintAuthority").as("mint_authority"),
        col("token_mint.supply").as("supply"), col("token_mint.decimals").as("decimals"),
        col("token_mint.isInitialized").as("is_initialized"),
        col("token_mint.freezeAuthority").as("freeze_authority"))

  /** One row per signer (explode G1, sqlite.rs:315-322); PK (pubkey, signer). */
  def tokenMultisigs(accounts: DataFrame): DataFrame =
    enrich(accounts).filter(col("token_multisig").isNotNull)
      .select(col("pubkey"), col("token_multisig.m").as("m"), col("token_multisig.n").as("n"),
        explode(col("token_multisig.signers")).as("signer"))
      .select(col("pubkey"), col("signer"), col("m"), col("n"))

  def tokenMetadata(accounts: DataFrame): DataFrame =
    enrich(accounts).filter(col("token_metadata").isNotNull)
      .select(col("pubkey"),
        col("token_metadata.mint").as("mint"),
        col("token_metadata.name").as("name"),
        col("token_metadata.symbol").as("symbol"),
        col("token_metadata.uri").as("uri"),
        col("token_metadata.sellerFeeBasisPoints").as("seller_fee_basis_points"),
        col("token_metadata.primarySaleHappened").as("primary_sale_happened"),
        col("token_metadata.isMutable").as("is_mutable"),
        col("token_metadata.editionNonce").as("edition_nonce"),
        col("token_metadata.tokenStandard").as("token_standard"),
        col("token_metadata.collectionVerified").as("collection_verified"),
        col("token_metadata.collectionKey").as("collection_key"),
        col("token_metadata.useMethod").as("use_method"),
        col("token_metadata.usesRemaining").as("uses_remaining"),
        col("token_metadata.usesTotal").as("uses_total"))

  /** K2 CSV projection (csv.rs:14-20, 48-54): 4 columns, base58 pubkeys,
    * duplicates preserved (no dedup — byte-match parity surface). */
  def csvProjection(accounts: DataFrame): DataFrame = {
    import graft.functions.functions.base58
    accounts.select(
      base58(col("pubkey")).as("pubkey"),
      base58(col("owner")).as("owner"),
      col("dataLen").as("data_len"),
      col("lamports"))
  }
}
