// boost::unordered_map -> std with boost's ADL hash_value protocol
// (scratch parity build)
#ifndef STUB_BOOST_UNORDERED_MAP
#define STUB_BOOST_UNORDERED_MAP 1
#include <cstddef>
#include <functional>
#include <string>
#include <type_traits>
#include <unordered_map>
namespace boost {
namespace stub_detail {
// prefer the type's ADL hash_value(); fall back to std::hash for
// standard types (string keys in abyss-fixmate)
template <class K>
auto hash_impl(const K& k, int) -> decltype(hash_value(k)) {
	return hash_value(k);
}
template <class K>
std::size_t hash_impl(const K& k, long) {
	return std::hash<K>()(k);
}
}
/** boost::hash: ADL hash_value() if available, else std::hash. */
template <class K>
struct hash {
	std::size_t operator()(const K& k) const {
		return static_cast<std::size_t>(
			stub_detail::hash_impl(k, 0));
	}
};
template <class K, class V>
using unordered_map = std::unordered_map<K, V, hash<K> >;
}
#endif
