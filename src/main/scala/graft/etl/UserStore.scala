package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The Firestore user-store surface (reference firebase_functions.py)
  * as operations on a small `users` dimension DataFrame. At scale this
  * is a broadcastable dimension; upserts are last-write-wins merges
  * (the Delta MERGE seam in production — here expressed as
  * union + window dedupe so it runs on plain parquet).
  */
object UserStore {

  /** P11 (firebase_functions.py:20-22): md5 -> base64. */
  def hashPassword(pw: Column): Column = base64(unhex(md5(pw)))

  /** The reference stores `str(b'...')[1:]` — the Python bytes repr
    * minus the leading 'b', i.e. the base64 WRAPPED IN SINGLE QUOTES
    * (firebase_functions.py:22). Bit-faithful variant. */
  def hashPasswordLegacy(pw: Column): Column =
    concat(lit("'"), hashPassword(pw), lit("'"))

  /** K2 upsert (doc_ref.set = whole-doc overwrite): last write wins. */
  def upsert(users: DataFrame, updates: DataFrame): DataFrame = {
    val tagged = users.withColumn("__v", lit(0))
      .unionByName(updates.withColumn("__v", lit(1)))
    val w = Window.partitionBy("username").orderBy(col("__v").desc)
    tagged.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__v", "__rn")
  }

  /** S2 (firebase_functions.py:37-45): equality scan, last-row-wins. */
  def currentAttributes(users: DataFrame, username: String,
                        passwordHash: Option[String] = None): DataFrame = {
    val base = users.filter(col("username") === username)
    passwordHash.fold(base)(h => base.filter(col("password_hash") === h)).limit(1)
  }

  /** check_user (firebase_functions.py:101-116): credentials exist? */
  def checkUser(users: DataFrame, username: String, passwordHash: String): Boolean =
    !currentAttributes(users, username, Some(passwordHash)).isEmpty

  def checkUserExists(users: DataFrame, username: String): Boolean =
    !currentAttributes(users, username).isEmpty

  /** is_connected_to_strava (firebase_functions.py:132-140):
    * len(strava_code) > 3. */
  def connectedToStrava(users: DataFrame): DataFrame =
    users.select(col("username"),
      (length(coalesce(col("strava_code"), lit(""))) > 3).as("connected"))

  /** C3 token-expiry scan (firebase_functions.py:88-97): which users
    * need an OAuth refresh. The refresh itself is a driver-side service
    * call, not a dataflow op. */
  def needingRefresh(users: DataFrame, nowEpoch: Double): DataFrame =
    users.filter(col("expires_at").isNull || col("expires_at") < nowEpoch)
      .select("username", "refresh_token")
}
