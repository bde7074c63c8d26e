// minimal boost::tuple -> std::tuple mapping (scratch parity build);
// adds the member get<N>() that boost::tuple has and std::tuple lacks
#ifndef STUB_BOOST_TUPLE
#define STUB_BOOST_TUPLE 1
#include <tuple>
#include <utility>
namespace boost {

template <typename... Ts>
struct tuple : std::tuple<Ts...> {
    using base = std::tuple<Ts...>;
    using base::base;
    tuple() = default;
    tuple(const base& t) : base(t) {}
    tuple(base&& t) : base(std::move(t)) {}
    template <int N>
    typename std::tuple_element<N, base>::type& get()
    { return std::get<N>(static_cast<base&>(*this)); }
    template <int N>
    const typename std::tuple_element<N, base>::type& get() const
    { return std::get<N>(static_cast<const base&>(*this)); }
};

using std::tie;
using std::get;

template <typename... Ts>
tuple<typename std::decay<Ts>::type...> make_tuple(Ts&&... ts)
{
    return tuple<typename std::decay<Ts>::type...>(
        std::forward<Ts>(ts)...);
}

}
#endif
